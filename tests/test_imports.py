"""Every module imports cleanly (catches breakage in rarely-exercised files)."""

import importlib
import pkgutil

import eav_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(eav_tpu.__path__, prefix="eav_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_entry_points_import():
    import bench  # noqa: F401
    import __graft_entry__  # noqa: F401
