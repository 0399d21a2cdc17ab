"""System-properties panel backend (reference
`optiland_gui/services/system_service.py:16-153`): aperture / field /
wavelength option enumeration and editing."""

from __future__ import annotations


class SystemService:
    def __init__(self, connector):
        self.connector = connector

    def get_aperture_types(self) -> list[str]:
        return ["EPD", "imageFNO", "objectNA", "float_by_stop"]

    def get_field_types(self) -> list[tuple[str, str]]:
        return [
            ("Angle", "angle"),
            ("Object Height", "object_height"),
            ("Paraxial Image Height", "paraxial_image_height"),
            ("Real Image Height", "real_image_height"),
        ]

    def get_ray_aiming_modes(self) -> list[str]:
        return ["paraxial", "iterative", "robust", "cached"]

    # -- current values --------------------------------------------------
    def get_aperture(self) -> tuple[str | None, float]:
        o = self.connector.get_optic()
        return o.aperture_type, o.aperture_value

    def set_aperture(self, aperture_type: str, value: float) -> None:
        self.connector.mutate(
            lambda o: o.set_aperture(aperture_type, float(value)))

    def get_fields(self) -> list[tuple[float, float, float, float]]:
        f = self.connector.get_optic().fields
        return list(zip(f.x, f.y, f.vx, f.vy))

    def set_fields(self, rows) -> None:
        def apply(o):
            o.fields.x.clear()
            o.fields.y.clear()
            o.fields.vx.clear()
            o.fields.vy.clear()
            for x, y, vx, vy in rows:
                o.fields.add(y=y, x=x, vx=vx, vy=vy)

        self.connector.mutate(apply)

    def set_field_type(self, field_type: str) -> None:
        self.connector.mutate(lambda o: o.set_field_type(field_type))

    def get_wavelengths(self) -> tuple[list[float], int]:
        w = self.connector.get_optic().wavelengths
        return list(w.values_um), w.primary_idx

    def set_wavelengths(self, values_um, primary_idx: int) -> None:
        def apply(o):
            o.wavelengths.values_um = [float(v) for v in values_um]
            o.wavelengths.primary_idx = int(primary_idx)
            o._dirty()

        self.connector.mutate(apply)

    def set_ray_aiming(self, mode: str) -> None:
        self.connector.mutate(lambda o: o.set_ray_aiming(mode))

    def set_polarization_state(self, state) -> None:
        """`state`: None/'ignore' or a PolarizationState (reference
        `system_service.py:82-135`)."""

        def apply(o):
            o.set_polarization("ignore" if state is None else state)

        self.connector.mutate(apply)

    # -- title / telecentricity / apodization ----------------------------
    def get_title(self) -> str:
        return self.connector.get_optic().name

    def set_title(self, title: str) -> None:
        def apply(o):
            o.name = str(title)

        self.connector.mutate(apply)

    def get_telecentric(self) -> bool:
        return bool(self.connector.get_optic().obj_space_telecentric)

    def set_telecentric(self, flag: bool) -> None:
        self.connector.mutate(lambda o: o.set_telecentric(bool(flag)))

    def get_apodization_types(self) -> list[str]:
        return ["uniform", "gaussian", "cosine", "cosine_fourth", "bartlett",
                "hanning", "hamming", "tukey"]

    def set_apodization(self, spec) -> None:
        """`spec`: None/'uniform', a name, (name, kwargs), or an instance."""
        def apply(o):
            o.set_apodization(None if spec in (None, "uniform") else spec)

        self.connector.mutate(apply)

    # -- pickups / solves tables (reference `system_properties_panel.py`
    # pickup & solve tabs; core `system/solves.py`) -----------------------
    def get_pickups(self) -> list[dict]:
        out = []
        for p in self.connector.get_optic().pickups.pickups:
            out.append({"source": p.source_surface_idx, "attr": p.attr_type,
                        "target": p.target_surface_idx, "scale": p.scale,
                        "offset": p.offset})
        return out

    def add_pickup(self, source: int, attr_type: str, target: int,
                   scale: float = 1.0, offset: float = 0.0) -> None:
        self.connector.mutate(
            lambda o: o.pickups.add(source, attr_type, target,
                                    scale=scale, offset=offset))

    def remove_pickup(self, index: int) -> None:
        def apply(o):
            o.pickups.pickups.pop(index)
            o._dirty()

        self.connector.mutate(apply)

    def get_solve_types(self) -> list[str]:
        from optiland_tpu.system.solves import _SOLVE_MAP

        return sorted(_SOLVE_MAP)

    def get_solves(self) -> list[dict]:
        out = []
        for s in self.connector.get_optic().solves.solves:
            out.append({"type": type(s).__name__,
                        "surface": getattr(s, "surface_idx", None)})
        return out

    def add_solve(self, solve_type: str, *args, **kwargs) -> None:
        self.connector.mutate(
            lambda o: o.solves.add(solve_type, *args, **kwargs))

    def remove_solve(self, index: int) -> None:
        def apply(o):
            o.solves.solves.pop(index)
            o._dirty()

        self.connector.mutate(apply)

    # -- info ------------------------------------------------------------
    def first_order(self) -> dict:
        """Paraxial summary table for the properties panel."""
        o = self.connector.get_optic()
        out = {}
        for name in ("f1", "f2", "EPD", "EPL", "FNO"):
            try:
                out[name] = float(getattr(o.paraxial, name)())
            except Exception:
                out[name] = float("nan")
        return out
