from optiland_tpu.sources.smf import SMFSource
from optiland_tpu.sources.base import BaseSource

__all__ = ["BaseSource", "SMFSource"]
