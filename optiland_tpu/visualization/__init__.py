from optiland_tpu.visualization.viewer import LensInfoViewer, OpticViewer

__all__ = ["OpticViewer", "LensInfoViewer"]
