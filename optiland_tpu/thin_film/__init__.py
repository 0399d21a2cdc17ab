from optiland_tpu.thin_film.stack import Layer, ThinFilmStack
from optiland_tpu.thin_film.core import tmm_coh

__all__ = ["Layer", "ThinFilmStack", "tmm_coh"]
