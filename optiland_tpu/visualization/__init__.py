from optiland_tpu.visualization.viewer import THEMES, LensInfoViewer, OpticViewer, SurfaceSagViewer
from optiland_tpu.visualization.viewer3d import OpticViewer3D

__all__ = ["OpticViewer", "LensInfoViewer", "OpticViewer3D",
           "SurfaceSagViewer", "THEMES"]
