"""The `Optic` facade: reference-compatible ergonomics over a functional core.

Mirrors the builder API of the reference's `Optic`
(`optiland/optic/optic.py:59-818`): `surfaces.add(...)` / `add_surface`,
`set_aperture`, `fields.set_type/add`, `wavelengths.add`, `paraxial.*`,
`trace(...)`. Unlike the reference — where these objects ARE the compute
graph — this class is a thin host-side description; `build()` compiles it to
a `(SystemStatic, SystemParams)` pair, and every query dispatches to jitted
pure functions keyed on the static spec. Mutating the prescription just
marks the description dirty and rebuilds the params pytree; jit re-use is
automatic while the structure is unchanged.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

from optiland_tpu.core import distributions as dist
from optiland_tpu.materials.catalog import resolve_material
from optiland_tpu.system import paraxial as px
from optiland_tpu.system.spec import SurfaceSpec, build_system
from optiland_tpu.trace import tracer as _tracer


@lru_cache(maxsize=256)
def _jit_trace(static, polarization=None):
    def fn(params, Hx, Hy, Px, Py, wavelength, apply_vignetting):
        return _tracer.trace_system(static, params, Hx, Hy, Px, Py, wavelength,
                                    apply_vignetting=apply_vignetting,
                                    polarization=polarization)

    return jax.jit(fn, static_argnames=("apply_vignetting",))


class _SurfaceCollection:
    """Builder for the surface list (reference `SurfaceGroup.add`)."""

    def __init__(self, optic: "Optic"):
        self._optic = optic
        self._specs: list[SurfaceSpec] = []

    def __len__(self):
        return len(self._specs)

    def __getitem__(self, i):
        return self._specs[i]

    @property
    def specs(self) -> list[SurfaceSpec]:
        return self._specs

    def add(
        self,
        index: int | None = None,
        radius: float = math.inf,
        thickness: float = 0.0,
        material="air",
        conic: float = 0.0,
        is_stop: bool = False,
        surface_type: str = "standard",
        coefficients=(),
        dx: float = 0.0,
        dy: float = 0.0,
        rx: float = 0.0,
        ry: float = 0.0,
        rz: float = 0.0,
        aperture: float | None = None,
        f: float = 0.0,
        coating=None,
        comment: str = "",
        **geom_kwargs,
    ):
        geometry = "standard"
        if surface_type in ("even_asphere", "odd_asphere", "polynomial",
                            "biconic", "toroidal", "chebyshev", "zernike",
                            "forbes_qbfs", "forbes_q2d", "grid_sag", "nurbs"):
            geometry = surface_type
            surface_type = "standard"
        if surface_type not in ("standard", "paraxial", "grating", "phase"):
            raise ValueError(
                f"Unknown surface_type {surface_type!r}; expected one of "
                "standard, paraxial, grating, even_asphere, odd_asphere, "
                "polynomial, biconic, toroidal, chebyshev, zernike, "
                "forbes_qbfs, forbes_q2d, grid_sag, nurbs"
            )
        if geometry == "chebyshev":
            # 2-D coefficient grid travels via geom_params (static shape)
            geom_kwargs.setdefault("coefficients", coefficients)
            coefficients = ()
        spec = SurfaceSpec(
            radius=float(radius),
            thickness=float(thickness),
            conic=float(conic),
            coefficients=tuple(float(c) for c in coefficients),
            material=resolve_material(material),
            geometry=geometry,
            surface_type=surface_type,
            is_stop=is_stop,
            semi_aperture=aperture,
            dx=dx, dy=dy, rx=rx, ry=ry, rz=rz,
            focal_length=f,
            coating=coating,
            geom_params=geom_kwargs,
            comment=comment,
        )
        if index is None or index == len(self._specs):
            self._specs.append(spec)
        else:
            self._specs.insert(index, spec)
        self._optic._dirty()
        return spec


class _FieldGroup:
    def __init__(self, optic: "Optic"):
        self._optic = optic
        self.field_type = "angle"
        self.x: list[float] = []
        self.y: list[float] = []
        self.vx: list[float] = []
        self.vy: list[float] = []

    def set_type(self, field_type: str):
        self.field_type = field_type
        self._optic._dirty()

    def add(self, y: float = 0.0, x: float = 0.0, vx: float = 0.0, vy: float = 0.0):
        self.x.append(float(x))
        self.y.append(float(y))
        self.vx.append(float(vx))
        self.vy.append(float(vy))
        self._optic._dirty()

    @property
    def num_fields(self):
        return len(self.x)

    @property
    def max_field(self):
        return max(
            (math.hypot(xx, yy) for xx, yy in zip(self.x, self.y)), default=0.0
        )

    def get_field_coords(self):
        m = self.max_field
        if m == 0:
            return [(0.0, 0.0)]
        return [(xx / m, yy / m) for xx, yy in zip(self.x, self.y)]


_UNIT_TO_UM = {"nm": 1e-3, "um": 1.0, "mm": 1e3}


class _WavelengthGroup:
    def __init__(self, optic: "Optic"):
        self._optic = optic
        self.values_um: list[float] = []
        self.primary_idx = 0

    def add(self, value: float, is_primary: bool = False, unit: str = "um"):
        self.values_um.append(float(value) * _UNIT_TO_UM[unit])
        if is_primary or len(self.values_um) == 1:
            self.primary_idx = len(self.values_um) - 1
        self._optic._dirty()

    @property
    def num_wavelengths(self):
        return len(self.values_um)

    @property
    def primary_wavelength(self):
        return self.values_um[self.primary_idx]


class _ParaxialFacade:
    """`optic.paraxial.f2()`-style accessors over the functional engine."""

    def __init__(self, optic: "Optic"):
        self._optic = optic

    def _sp(self):
        return self._optic.build()

    def __getattr__(self, name):
        fn = getattr(px, name, None)
        if fn is None:
            raise AttributeError(name)

        def call(*args, **kw):
            static, params = self._sp()
            return fn(static, params, *args, **kw)

        return call


class Optic:
    """A sequential optical system (lens prescription + trace entrypoints)."""

    def __init__(self, name: str | None = None):
        self.name = name or self.__class__.__name__
        self.surfaces = _SurfaceCollection(self)
        self.fields = _FieldGroup(self)
        self.obj_space_telecentric = False
        self.wavelengths = _WavelengthGroup(self)
        self.aperture_type: str | None = None
        self.aperture_value: float = 0.0
        self.polarization = "ignore"  # "ignore" | PolarizationState
        self.apodization = None
        self.ray_aiming = "paraxial"  # "paraxial" | "iterative" | "robust"
        self._built = None
        self.paraxial = _ParaxialFacade(self)
        from optiland_tpu.system.solves import PickupManager, SolveManager

        self.pickups = PickupManager(self)
        self.solves = SolveManager(self)

    # -- builder API -------------------------------------------------------
    def _dirty(self):
        self._built = None

    def add_surface(self, **kw):
        return self.surfaces.add(**kw)

    def set_aperture(self, aperture_type: str, value: float):
        if aperture_type == "float_by_stop_size":
            aperture_type = "float_by_stop"
        self.aperture_type = aperture_type
        self.aperture_value = float(value)
        self._dirty()

    def set_field_type(self, field_type: str):
        if field_type not in ("angle", "object_height",
                              "paraxial_image_height", "real_image_height"):
            raise ValueError(f"Invalid field type: {field_type}.")
        self.fields.set_type(field_type)

    def set_telecentric(self, is_telecentric: bool = True):
        """Object-space telecentricity flag (reference
        `fields/field_group.py:212`)."""
        self.obj_space_telecentric = bool(is_telecentric)
        self._dirty()

    def set_apodization(self, spec):
        """Set pupil apodization: name, (name, kwargs), or instance
        (reference `optiland/apodization/`)."""
        from optiland_tpu.core.apodization import make_apodization

        self.apodization = make_apodization(spec)
        self._dirty()

    def set_ray_aiming(self, mode: str):
        """Choose the ray-aiming strategy (reference
        `rays/ray_aiming/registry.py`)."""
        if mode not in ("paraxial", "iterative", "robust", "cached"):
            raise ValueError(
                "ray aiming must be paraxial, iterative, robust, or cached")
        self.ray_aiming = mode
        self._aim_cache = {}

    def _aim(self, static, params, Hx, Hy, Px, Py, wavelength):
        if self.ray_aiming == "paraxial":
            return Px, Py
        from optiland_tpu.trace import aiming

        if self.ray_aiming == "cached":
            # memoized iterative aim (reference `ray_aiming/cached.py:22-147`
            # hashes system + inputs); keyed on the parameter pytree bytes +
            # the query coordinates, so edits invalidate naturally
            import hashlib

            import numpy as np

            h = hashlib.sha256()
            for leaf in jax.tree.leaves(params):
                h.update(np.asarray(leaf).tobytes())
            for a in (Hx, Hy, Px, Py, wavelength):
                h.update(np.asarray(a).tobytes())
            key = h.hexdigest()
            cache = getattr(self, "_aim_cache", None)
            if cache is None:
                cache = self._aim_cache = {}
            if key not in cache:
                cache[key] = aiming.aim_rays_iterative(
                    static, params, Hx, Hy, Px, Py,
                    jnp.asarray(wavelength, params.cv.dtype))
            return cache[key]

        fn = (aiming.aim_rays_iterative if self.ray_aiming == "iterative"
              else aiming.aim_rays_robust)
        return fn(static, params, Hx, Hy, Px, Py,
                  jnp.asarray(wavelength, params.cv.dtype))

    def set_polarization(self, state):
        """Set the trace polarization: "ignore" (scalar trace) or a
        PolarizationState (reference `Optic.polarization`)."""
        from optiland_tpu.polarization import PolarizationState

        if state == "ignore" or isinstance(state, PolarizationState):
            self.polarization = state
        elif state == "unpolarized":
            self.polarization = PolarizationState.unpolarized()
        else:
            raise ValueError(
                "polarization must be 'ignore', 'unpolarized', or a "
                "PolarizationState"
            )

    def _pol(self):
        return None if self.polarization == "ignore" else self.polarization

    def add_field(self, y: float = 0.0, x: float = 0.0, vx: float = 0.0,
                  vy: float = 0.0):
        self.fields.add(y=y, x=x, vx=vx, vy=vy)

    def add_wavelength(self, value: float, is_primary: bool = False,
                       unit: str = "um"):
        self.wavelengths.add(value, is_primary=is_primary, unit=unit)

    @property
    def primary_wavelength(self):
        return self.wavelengths.primary_wavelength

    # -- compilation ---------------------------------------------------------
    def build(self):
        """Compile to (SystemStatic, SystemParams); cached until mutated."""
        if self._built is None:
            if self.aperture_type is None:
                raise ValueError("No aperture defined; call set_aperture().")
            if not self.wavelengths.num_wavelengths:
                raise ValueError("No wavelengths defined.")
            if not self.fields.num_fields:
                self.fields.add(y=0.0)
            self._built = build_system(
                self.surfaces.specs,
                field_type=self.fields.field_type,
                x_fields=self.fields.x,
                y_fields=self.fields.y,
                vx=self.fields.vx,
                vy=self.fields.vy,
                aperture_type=self.aperture_type,
                aperture_value=self.aperture_value,
                wavelengths=self.wavelengths.values_um,
                primary_wavelength_idx=self.wavelengths.primary_idx,
                apodization=self.apodization,
                telecentric=self.obj_space_telecentric,
            )
        return self._built

    @property
    def static(self):
        return self.build()[0]

    @property
    def params(self):
        return self.build()[1]

    def update_params(self, params):
        """Install an externally-updated parameter pytree (e.g. an optimizer
        step) without touching the structure."""
        static, _ = self.build()
        self._built = (static, params)

    def update(self):
        """Re-apply pickups and solves (reference `Optic.update`)."""
        self.pickups.apply()
        self.solves.apply()

    # -- per-surface edits (reference `optic/optic_updater.py:38-160`,
    #    re-exported on the facade as in `optic/optic.py:350-446`) ----------
    def set_radius(self, value: float, surface_number: int):
        """Set the radius of curvature of surface `surface_number`."""
        self.surfaces.specs[surface_number].radius = float(value)
        self._dirty()

    def set_conic(self, value: float, surface_number: int):
        """Set the conic constant of surface `surface_number`."""
        self.surfaces.specs[surface_number].conic = float(value)
        self._dirty()

    def set_thickness(self, value: float, surface_number: int):
        """Set the gap thickness AFTER surface `surface_number`."""
        self.surfaces.specs[surface_number].thickness = float(value)
        self._dirty()

    def set_index(self, value: float, surface_number: int):
        """Make the medium after surface `surface_number` an ideal material
        of constant index `value`."""
        from optiland_tpu.materials.catalog import resolve_material

        self.surfaces.specs[surface_number].material = resolve_material(
            float(value))
        self._dirty()

    def set_material(self, material, surface_number: int):
        """Set the medium after surface `surface_number` (name string,
        (name, manufacturer) tuple, number, or MaterialSpec)."""
        from optiland_tpu.materials.catalog import MaterialSpec, \
            resolve_material

        if not isinstance(material, MaterialSpec):
            material = resolve_material(material)
        self.surfaces.specs[surface_number].material = material
        self._dirty()

    def set_asphere_coeff(self, value: float, surface_number: int,
                          aspher_coeff_idx: int):
        """Set one polynomial coefficient of an asphere surface."""
        s = self.surfaces.specs[surface_number]
        c = list(s.coefficients)
        while len(c) <= aspher_coeff_idx:
            c.append(0.0)
        c[aspher_coeff_idx] = float(value)
        s.coefficients = tuple(c)
        self._dirty()

    # -- system-level edits (reference `optic/optic_updater.py:24-340`) -----
    def scale_system(self, scale_factor: float):
        """Scale every length in the prescription (radii, thicknesses,
        freeform coefficients, apertures) by `scale_factor` — reference
        `optic_updater.py:175-204` + per-geometry `geometries/*.scale`."""
        f = float(scale_factor)
        for s in self.surfaces.specs:
            if math.isfinite(s.radius):
                s.radius *= f
            if math.isfinite(s.thickness):
                s.thickness *= f
            gp = s.geom_params
            g = s.geometry
            if g == "even_asphere":
                s.coefficients = tuple(
                    c * f ** (1 - 2 * (i + 1))
                    for i, c in enumerate(s.coefficients))
            elif g == "odd_asphere":
                s.coefficients = tuple(
                    c * f ** (1 - (i + 1))
                    for i, c in enumerate(s.coefficients))
            elif g == "polynomial":
                # flattened (order+1)^2 grid; C_ij' = C_ij * f^(1-(i+j))
                n = len(s.coefficients)
                order = int(round(n**0.5)) - 1
                s.coefficients = tuple(
                    c * f ** (1 - (idx // (order + 1) + idx % (order + 1)))
                    for idx, c in enumerate(s.coefficients))
            elif g == "chebyshev":
                gp["norm_x"] = gp.get("norm_x", 1.0) * f
                gp["norm_y"] = gp.get("norm_y", 1.0) * f
                import numpy as _np

                gp["coefficients"] = _np.asarray(
                    gp.get("coefficients", s.coefficients), float) * f
            elif g == "zernike":
                gp["norm_radius"] = gp.get("norm_radius", 1.0) * f
                s.coefficients = tuple(c * f for c in s.coefficients)
            elif g in ("forbes_qbfs", "forbes_q2d"):
                if gp.get("norm_radius") is not None:
                    gp["norm_radius"] = gp["norm_radius"] * f
                if "radial_terms" in gp:
                    gp["radial_terms"] = {
                        k: v * f for k, v in gp["radial_terms"].items()}
                if "freeform_coeffs" in gp:
                    gp["freeform_coeffs"] = {
                        k: v * f for k, v in gp["freeform_coeffs"].items()}
                s.coefficients = tuple(c * f for c in s.coefficients)
            elif g == "biconic":
                if math.isfinite(gp.get("radius_y", math.inf)):
                    gp["radius_y"] = gp["radius_y"] * f
            elif g == "toroidal":
                if math.isfinite(gp.get("radius_y", math.inf)):
                    gp["radius_y"] = gp["radius_y"] * f
                poly = list(gp.get("coeffs_poly_y", s.coefficients))
                poly = [c * f ** (1 - 2 * (i + 1))
                        for i, c in enumerate(poly)]
                if "coeffs_poly_y" in gp:
                    gp["coeffs_poly_y"] = poly
                else:
                    s.coefficients = tuple(poly)
            elif g == "grid_sag":
                import numpy as _np

                for key in ("x_coordinates", "y_coordinates", "sag_values"):
                    gp[key] = _np.asarray(gp[key], float) * f
            if "grating_period" in gp:
                gp["grating_period"] = gp["grating_period"] * f
            sa = s.semi_aperture
            if isinstance(sa, (int, float)):
                s.semi_aperture = sa * f
            elif sa is not None and hasattr(sa, "scale"):
                s.semi_aperture = sa.scale(f)
        # EPD / float_by_stop values are lengths; FNO and NA are ratios
        # (reference `aperture/*.is_scalable`)
        if self.aperture_type in ("EPD", "float_by_stop"):
            self.aperture_value *= f
        self._dirty()

    def flip(self):
        """Reverse the optical train in place: surface order, curvature
        signs, media, and inter-surface gaps (reference
        `optic_updater.py:267-289` + `surface_group.py:458-552`). Object and
        image gaps are preserved; pickups/solves referencing surface indices
        are remapped."""
        specs = self.surfaces.specs
        n = len(specs)
        if n < 3:
            raise ValueError(
                "Optic flip requires at least 3 surfaces (obj, element, img)")
        inner = specs[1:-1]
        # media sequence: material[k] is the medium AFTER surface k.
        # Reversing the train, the medium after new surface j (old surface
        # n-1-j) is the medium that was BEFORE the old surface.
        old_mats = [s.material for s in specs]
        old_thick = [s.thickness for s in specs]
        new_inner = list(reversed(inner))
        for j, s in enumerate(new_inner):
            old_idx = n - 2 - j
            if math.isfinite(s.radius):
                s.radius = -s.radius
            # per-geometry flip semantics (reference `geometries/*.flip`):
            # all curvature-like radii negate; conics and polynomial
            # coefficients stay (reference `newton_raphson.py:66-72`)
            if (s.geometry in ("biconic", "toroidal")
                    and "radius_y" in s.geom_params
                    and math.isfinite(s.geom_params["radius_y"])):
                s.geom_params["radius_y"] = -s.geom_params["radius_y"]
            if s.geometry == "grid_sag" and "sag_values" in s.geom_params:
                import numpy as _np

                s.geom_params["sag_values"] = -_np.asarray(
                    s.geom_params["sag_values"], float)
            s.material = (old_mats[old_idx - 1]
                          if not s.material.mirror else s.material)
            # internal gaps reverse; the gap to the image plane stays
            s.thickness = (old_thick[n - 2 - (j + 1)] if j < n - 3
                           else old_thick[n - 2])
        self.surfaces._specs = [specs[0]] + new_inner + [specs[-1]]

        def remap(idx):
            return idx if idx in (0, n - 1) else n - 1 - idx

        for p in getattr(self.pickups, "pickups", []):
            p.source_surface_idx = remap(p.source_surface_idx)
            p.target_surface_idx = remap(p.target_surface_idx)
        self._dirty()

    def __add__(self, other: "Optic") -> "Optic":
        """Concatenate two systems: self's surfaces (sans image plane)
        followed by other's (sans object plane) — reference
        `optic/optic.py` `__add__` / `surface_group.py:63-84`."""
        import copy

        out = Optic(f"{self.name}+{other.name}")
        out.aperture_type = self.aperture_type
        out.aperture_value = self.aperture_value
        out.fields = copy.deepcopy(self.fields)
        out.fields._optic = out
        out.wavelengths = copy.deepcopy(self.wavelengths)
        out.wavelengths._optic = out
        out.obj_space_telecentric = self.obj_space_telecentric
        left = [copy.deepcopy(s) for s in self.surfaces.specs[:-1]]
        right = [copy.deepcopy(s) for s in other.surfaces.specs[1:]]
        # at most one stop in the combined system: keep self's
        has_stop = any(s.is_stop for s in left)
        for s in right:
            if has_stop:
                s.is_stop = False
        out.surfaces._specs = left + right
        return out

    def update_paraxial(self):
        """Recompute per-surface semi-apertures from the marginal + chief
        paraxial rays (reference `optic_updater.py:206-228`). The values are
        stored on `self.semi_apertures` (used by draw() and edge-thickness
        operands) without altering clip apertures the user set explicitly."""
        import numpy as np

        static, params = self.build()
        ya, _ = px.marginal_ray(static, params)
        yb, _ = px.chief_ray(static, params)
        r = np.abs(np.asarray(ya).ravel()) + np.abs(np.asarray(yb).ravel())
        for k, s in enumerate(self.surfaces.specs):
            if isinstance(s.semi_aperture, (int, float)):
                r[k] = max(r[k], float(s.semi_aperture))
        self.semi_apertures = r
        return r

    # -- convenience views (reference `Optic.draw/info`) --------------------
    def draw(self, **kwargs):
        from optiland_tpu.visualization import OpticViewer

        return OpticViewer(self).view(**kwargs)

    def draw3D(self, **kwargs):
        """3-D render (reference `Optic.draw3D`, VTK there; matplotlib 3-D
        by default here — see `visualization/viewer3d.py`)."""
        from optiland_tpu.visualization import OpticViewer3D

        return OpticViewer3D(self).view(**kwargs)

    def info(self):
        from optiland_tpu.visualization import LensInfoViewer

        return LensInfoViewer(self).view()

    # -- serialization ----------------------------------------------------
    def to_dict(self):
        from optiland_tpu.fileio import optic_to_dict

        return optic_to_dict(self)

    @classmethod
    def from_dict(cls, data):
        from optiland_tpu.fileio import optic_from_dict

        return optic_from_dict(data)

    # -- tracing ---------------------------------------------------------
    def trace(self, Hx=0.0, Hy=0.0, wavelength=None, num_rays: int = 100,
              distribution="hexapolar"):
        """Trace a pupil distribution for field point(s); returns TraceHistory
        (reference `Optic.trace`, `optic/optic.py:715`)."""
        static, params = self.build()
        if wavelength is None:
            wavelength = self.primary_wavelength
        if isinstance(distribution, str):
            out = dist.generate(distribution, num_rays)
            Px, Py = out[:2]
        else:
            Px, Py = distribution

        Hx = jnp.atleast_1d(jnp.asarray(Hx, params.cv.dtype))
        Hy = jnp.atleast_1d(jnp.asarray(Hy, params.cv.dtype))
        nP = Px.shape[0]
        Hx_full = jnp.repeat(Hx, nP)
        Hy_full = jnp.repeat(Hy, nP)
        Px_full = jnp.tile(Px, Hx.shape[0])
        Py_full = jnp.tile(Py, Hx.shape[0])
        Px_full, Py_full = self._aim(static, params, Hx_full, Hy_full,
                                     Px_full, Py_full, wavelength)
        return _jit_trace(static, self._pol())(
            params, Hx_full, Hy_full, Px_full, Py_full,
            jnp.asarray(wavelength, params.cv.dtype), True
        )

    def trace_generic(self, Hx, Hy, Px, Py, wavelength=None):
        """Trace explicit (field, pupil) coordinate arrays. Vignetting is
        applied to the pupil coordinates as in the reference's
        `RealRayTracer.trace_generic` (`raytrace/real_ray_tracer.py:120-154`)."""
        static, params = self.build()
        if wavelength is None:
            wavelength = self.primary_wavelength
        from optiland_tpu.trace.raygen import vignetting_factors

        Hx = jnp.atleast_1d(jnp.asarray(Hx, params.cv.dtype))
        Hy = jnp.atleast_1d(jnp.asarray(Hy, params.cv.dtype))
        Px = jnp.atleast_1d(jnp.asarray(Px, params.cv.dtype))
        Py = jnp.atleast_1d(jnp.asarray(Py, params.cv.dtype))
        Hx, Hy, Px, Py = jnp.broadcast_arrays(Hx, Hy, Px, Py)
        vxf, vyf = vignetting_factors(static, params, Hx, Hy)
        Px = Px * (1.0 - vxf)
        Py = Py * (1.0 - vyf)
        Px, Py = self._aim(static, params, Hx, Hy, Px, Py, wavelength)
        return _jit_trace(static, self._pol())(
            params, Hx, Hy, Px, Py, jnp.asarray(wavelength, params.cv.dtype), True
        )
