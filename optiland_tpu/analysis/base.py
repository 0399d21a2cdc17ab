"""Shared analysis plumbing (re-exports; see `core/resolve.py`)."""

from optiland_tpu.core.resolve import resolve_fields, resolve_wavelengths

__all__ = ["resolve_fields", "resolve_wavelengths"]
