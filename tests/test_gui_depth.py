"""Headless tests of the round-4 GUI depth: analysis registry + windowed
runner, optimization metadata/async run, geometry param editors, system
properties (pickups/solves/title), viewer service, command palette, toast
manager, logging bridge (reference `optiland_gui/` — registry.py,
analysis_panel.py, optimization_panel.py, system_properties_panel.py,
viewer_panel.py, widgets/{command_palette,toast}.py,
utils/logging_handler.py)."""

import logging
import math

import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from optiland_tpu_gui.main_window import MainWindow  # noqa: E402


@pytest.fixture()
def window(tmp_path):
    from optiland_tpu_gui.settings import GuiConfig

    return MainWindow(config=GuiConfig(path=str(tmp_path / "gui.json")))


# ---------------------------------------------------------------------------
# analysis registry + runner
# ---------------------------------------------------------------------------
def test_registry_resolves_every_entry():
    from optiland_tpu_gui import registry

    for _, name, _ in registry.ANALYSIS_REGISTRY:
        cls = registry.resolve(name)
        assert isinstance(cls, type), name
        schema = registry.settings_schema(name)
        assert isinstance(schema, dict)
    assert "Spot & Ray" in registry.categories()
    assert "Spot Diagram" in registry.names("Spot & Ray")


def test_registry_settings_schema_defaults():
    from optiland_tpu_gui import registry

    schema = registry.settings_schema("Spot Diagram")
    assert "num_rays" in schema or "num_rings" in schema
    defaults = registry.default_settings("Spot Diagram")
    for v in defaults.values():
        assert isinstance(v, (bool, int, float, str))


def test_analysis_windows_and_settings_roundtrip(window, tmp_path):
    r = window.analysis_runner
    r.run("Spot Diagram", num_rings=3)
    r.run("Ray Fan", num_points=11)
    assert r.window_titles() == ["Spot Diagram #1", "Ray Fan #2"]
    assert r.current.name == "Ray Fan"

    path = str(tmp_path / "settings.json")
    r.save_settings(path)
    name, settings = r.load_settings(path)
    assert name == "Ray Fan" and settings == {"num_points": 11}

    r.select(0)
    assert r.current.name == "Spot Diagram"
    r.rerun()
    r.close_window(0)
    assert r.window_titles() == ["Ray Fan #2"]
    r.close_all()
    assert r.current is None


def test_analysis_auto_refresh(window):
    r = window.analysis_runner
    r.run("Spot Diagram", num_rings=3)
    before = r.current.created
    r.auto_refresh = True
    window.surface_service.set_surface_data(1, 2, 95.0)  # radius
    assert r.current.created >= before


# ---------------------------------------------------------------------------
# optimization service depth
# ---------------------------------------------------------------------------
def test_operand_metadata_and_validation(window):
    s = window.optimization_service
    meta = s.get_operand_metadata("f2")
    assert meta["fields"] == {}
    meta = s.get_operand_metadata("rms_spot_size")
    assert "surface_number" in meta["fields"]
    assert s.validate_operand_input_data("rms_spot_size", {}) is None \
        or isinstance(s.validate_operand_input_data("rms_spot_size", {}),
                      str)
    assert s.validate_operand_input_data("nope", {}) is not None
    err = s.validate_operand_input_data("f2", {"bogus": 1})
    assert err and "bogus" in err


def test_operand_and_variable_current_values(window):
    s = window.optimization_service
    s.add_operand("f2", target=100.0)
    v = s.get_operand_current_value(0)
    assert v is not None and 90 < v < 110  # ~f=97 singlet
    s.add_variable("radius", surface_number=1)
    rv = s.get_variable_current_value(0)
    assert rv == pytest.approx(100.0)


def test_optimizer_catalog_and_bounds_validation(window):
    s = window.optimization_service
    groups = s.get_optimizer_groups()
    assert set(sum(groups.values(), [])) == set(s.OPTIMIZERS)
    meta = s.get_optimizer_metadata("dual_annealing")
    assert meta["requires_bounds"]
    s.add_variable("radius", surface_number=1)  # unbounded
    assert s.validate_bounds_for_optimizer("dual_annealing") is not None
    assert s.validate_bounds_for_optimizer("generic") is None
    s.set_variable(0, kwargs={"min_val": 50.0, "max_val": 200.0})
    assert s.validate_bounds_for_optimizer("dual_annealing") is None


def test_async_run_and_progress(window):
    s = window.optimization_service
    s.add_operand("f2", target=95.0)
    s.add_variable("radius", surface_number=1)
    ticks = []
    s.progress.connect(lambda it, merit: ticks.append(merit))
    done = []
    s.finished.connect(lambda res: done.append(res))
    s.run_async("generic", maxiter=5)
    assert s.is_running() or done  # may finish fast
    s.wait(60)
    assert done, "optimization thread did not finish"
    assert len(s.merit_history) >= 2
    assert s.merit_history[-1] <= s.merit_history[0] + 1e-9


def test_problem_serialization_roundtrip(window):
    s = window.optimization_service
    s.add_operand("rms_spot_size", target=0.0, weight=2.0, num_rays=8)
    s.add_variable("radius", surface_number=1, min_val=50.0, max_val=200.0)
    d = s.to_dict()
    s.clear()
    s.from_dict(d)
    assert s.operands[0].operand_type == "rms_spot_size"
    assert s.operands[0].input_data["num_rays"] == 8
    assert s.variables[0].kwargs["min_val"] == 50.0


# ---------------------------------------------------------------------------
# surface service depth
# ---------------------------------------------------------------------------
def test_geometry_params_roundtrip(window):
    ss = window.surface_service
    ss.set_surface_data(1, 0, "even_asphere")
    ss.set_surface_geometry_params(
        1, {"radius": 80.0, "conic": -0.5, "coefficients": [1e-5, -2e-7]})
    p = ss.get_surface_geometry_params(1)
    assert p["geometry"] == "even_asphere"
    assert p["radius"] == 80.0 and p["conic"] == -0.5
    assert p["coefficients"] == [1e-5, -2e-7]
    with pytest.raises(KeyError):
        ss.set_surface_geometry_params(1, {"norm_radius": 1.0})


def test_biconic_params_via_geom_params(window):
    ss = window.surface_service
    ss.set_surface_data(1, 0, "biconic")
    ss.set_surface_geometry_params(1, {"radius_y": 120.0, "conic_y": -1.0})
    p = ss.get_surface_geometry_params(1)
    assert p["radius_y"] == 120.0 and p["conic_y"] == -1.0
    # the packed system must build with the x/y split
    window.connector.get_optic().build()


def test_paraxial_row_focal_length_column(window):
    ss = window.surface_service
    ss.set_surface_data(1, 0, "paraxial")
    assert ss.get_column_headers_for(1)[2] == "Focal Length"
    ss.set_surface_data(1, 2, 75.0)
    assert ss.get_surface_data(1, 2) == 75.0
    info = ss.get_surface_type_info(1)
    assert info["is_paraxial"] and info["surface_type"] == "paraxial"
    # standard rows keep the Radius header
    assert ss.get_column_headers_for(2)[2] == "Radius"


def test_material_display_includes_index(window):
    ss = window.surface_service
    disp = ss.get_material_display(1)
    assert "n=1.5000" in disp


# ---------------------------------------------------------------------------
# system service depth
# ---------------------------------------------------------------------------
def test_title_telecentric_apodization(window):
    sys_s = window.system_service
    sys_s.set_title("My Lens")
    assert sys_s.get_title() == "My Lens"
    assert not sys_s.get_telecentric()
    assert "gaussian" in sys_s.get_apodization_types()
    sys_s.set_apodization(("gaussian", {"sigma": 0.7}))
    sys_s.set_apodization("uniform")


def test_pickups_table(window):
    sys_s = window.system_service
    sys_s.add_pickup(1, "thickness", 2, scale=1.0, offset=0.5)
    rows = sys_s.get_pickups()
    assert rows == [{"source": 1, "attr": "thickness", "target": 2,
                     "scale": 1.0, "offset": 0.5}]
    # pickup applied on add: surface 2 thickness = 5.0*1 + 0.5
    assert window.surface_service.get_surface_data(2, 3) == pytest.approx(5.5)
    sys_s.remove_pickup(0)
    assert sys_s.get_pickups() == []


def test_solves_table(window):
    sys_s = window.system_service
    assert len(sys_s.get_solve_types()) >= 3
    sys_s.add_solve("quick_focus")
    assert sys_s.get_solves()[0]["type"].lower().startswith("quickfocus")
    sys_s.remove_solve(0)
    assert sys_s.get_solves() == []


# ---------------------------------------------------------------------------
# viewer service
# ---------------------------------------------------------------------------
def test_viewer_service_renders(window):
    vs = window.viewer_service
    assert vs.needs_render
    fig = vs.render()
    assert fig is not None and not vs.needs_render
    window.surface_service.set_surface_data(1, 3, 6.0)  # thickness
    assert vs.needs_render
    vs.update_settings(projection="3d", num_rays=6)
    fig = vs.render()
    assert vs.render_count == 2
    with pytest.raises(AttributeError):
        vs.update_settings(bogus=1)


def test_viewer_settings_roundtrip(window):
    from optiland_tpu_gui.services.viewer_service import ViewerSettings

    s = ViewerSettings(num_rays=7, dark_mode=True)
    s2 = ViewerSettings.from_dict(s.to_dict())
    assert s2.num_rays == 7 and s2.dark_mode


def test_viewer_sag_and_info(window):
    fig, _axes = window.viewer_service.render_sag(1, n=16)
    assert fig is not None
    rows = window.viewer_service.info_table()
    assert len(rows) >= 4


# ---------------------------------------------------------------------------
# command palette
# ---------------------------------------------------------------------------
def test_fuzzy_score_ordering():
    from optiland_tpu_gui.command_palette import fuzzy_score

    assert fuzzy_score("xyz", "spot diagram") is None
    exact = fuzzy_score("spot", "spot diagram")
    scattered = fuzzy_score("spot", "s p o t somewhere far")
    assert exact is not None and scattered is not None
    assert exact > scattered  # consecutive + early beats scattered


def test_palette_query_and_recent_boost(window):
    p = window.palette
    hits = p.query("undo")
    assert hits and hits[0].id == "edit.undo"
    # executing a command boosts it for ambiguous queries
    p.execute("analysis.run.Ray Fan")
    hits = p.query("ra")
    assert hits[0].id == "analysis.run.Ray Fan"
    assert window.analysis_runner.window_titles()  # it actually ran


def test_palette_respects_enabled(window):
    window.actions.set_enabled("edit.undo", False)
    assert all(c.id != "edit.undo" for c in window.palette.query("undo"))
    window.actions.set_enabled("edit.undo", True)
    assert any(c.id == "edit.undo" for c in window.palette.query("undo"))


# ---------------------------------------------------------------------------
# toasts
# ---------------------------------------------------------------------------
def test_toast_queue_and_expiry():
    from optiland_tpu_gui.toast import ToastManager

    tm = ToastManager(max_visible=2)
    shown, dismissed = [], []
    tm.shown.connect(shown.append)
    tm.dismissed.connect(dismissed.append)
    t1 = tm.info("one")
    t2 = tm.warning("two")
    t3 = tm.error("three")
    assert [t1, t2] == tm.visible and [t3] == tm.queue
    assert len(shown) == 2
    tm.tick(now=t1.created + 3.5)  # info (3s) expires, warning (5s) stays
    assert t1 in dismissed and t2 in tm.visible
    assert t3 in tm.visible and not tm.queue  # promoted
    assert len(tm.history) == 3


def test_optimization_failure_toast(window):
    window.optimization_service.failed.emit(RuntimeError("boom"))
    assert any("boom" in t.message for t in window.toasts.history)


# ---------------------------------------------------------------------------
# logging bridge
# ---------------------------------------------------------------------------
def test_logging_handler_captures(window):
    records = []
    window.log_handler.record_added.connect(
        lambda lv, msg: records.append((lv, msg)))
    logging.getLogger("optiland_tpu.test").info("hello from the core")
    assert any("hello from the core" in m for _, m in records)
    tail = window.log_handler.tail(10)
    assert any("hello from the core" in m for m in tail)
    warn_only = window.log_handler.tail(10, min_level=logging.WARNING)
    assert not any("hello from the core" in m for m in warn_only)
    window.log_handler.clear()
    assert window.log_handler.records == []


# ---------------------------------------------------------------------------
# panel layout via palette
# ---------------------------------------------------------------------------
def test_panel_toggle_via_palette(window):
    assert window.panels.is_visible("viewer")
    window.palette.execute("panel.toggle.viewer")
    assert not window.panels.is_visible("viewer")
