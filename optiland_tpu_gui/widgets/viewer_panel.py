"""Viewer panel (reference `optiland_gui/viewer_panel.py:1-832`): embedded
2D/3D system render with a settings strip (projection, ray count,
distribution, dark mode), driven by the headless `ViewerService`; plus the
surface-sag sub-panel (reference `surface_sag_viewer.py`)."""

from __future__ import annotations

from PySide6 import QtWidgets
from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg


class ViewerPanel(QtWidgets.QWidget):
    def __init__(self, viewer_service):
        super().__init__()
        self.service = viewer_service
        lay = QtWidgets.QVBoxLayout(self)

        strip = QtWidgets.QHBoxLayout()
        self.projection = QtWidgets.QComboBox()
        self.projection.addItems(["2d", "3d"])
        strip.addWidget(QtWidgets.QLabel("View"))
        strip.addWidget(self.projection)
        self.num_rays = QtWidgets.QSpinBox()
        self.num_rays.setRange(1, 256)
        self.num_rays.setValue(self.service.settings.num_rays)
        strip.addWidget(QtWidgets.QLabel("Rays"))
        strip.addWidget(self.num_rays)
        self.dark = QtWidgets.QCheckBox("Dark")
        strip.addWidget(self.dark)
        refresh = QtWidgets.QPushButton("Refresh")
        refresh.clicked.connect(self.refresh)
        strip.addWidget(refresh)
        strip.addStretch(1)
        lay.addLayout(strip)

        self.holder = QtWidgets.QVBoxLayout()
        lay.addLayout(self.holder, 1)
        self.service.connector.system_changed.connect(self.refresh)
        self.refresh()

    def refresh(self):
        self.service.update_settings(
            projection=self.projection.currentText(),
            num_rays=self.num_rays.value(),
            dark_mode=self.dark.isChecked())
        while self.holder.count():
            w = self.holder.takeAt(0).widget()
            if w:
                w.deleteLater()
        fig = self.service.render()
        self.holder.addWidget(FigureCanvasQTAgg(fig))


class SagViewerPanel(QtWidgets.QWidget):
    """Surface-sag cross-section/heatmap panel."""

    def __init__(self, viewer_service):
        super().__init__()
        self.service = viewer_service
        lay = QtWidgets.QVBoxLayout(self)
        top = QtWidgets.QHBoxLayout()
        self.surface = QtWidgets.QSpinBox()
        self.surface.setMinimum(1)
        show = QtWidgets.QPushButton("Show sag")
        show.clicked.connect(self.refresh)
        top.addWidget(QtWidgets.QLabel("Surface"))
        top.addWidget(self.surface)
        top.addWidget(show)
        top.addStretch(1)
        lay.addLayout(top)
        self.holder = QtWidgets.QVBoxLayout()
        lay.addLayout(self.holder, 1)

    def refresh(self):
        while self.holder.count():
            w = self.holder.takeAt(0).widget()
            if w:
                w.deleteLater()
        out = self.service.render_sag(self.surface.value())
        fig = out[0] if isinstance(out, tuple) else out
        self.holder.addWidget(FigureCanvasQTAgg(fig))
