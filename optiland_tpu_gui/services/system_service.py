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
