"""Helpers to import the REFERENCE torch SAM-2 modules (read-only, CPU) for
golden-parity tests. hydra/iopath are stubbed; nothing from the reference is
copied — its modules are executed as the golden oracle."""
import sys
import types

REF = "/root/reference/VideoGLaMM"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_sam2():
    """Returns the reference `model.segment_anything_2.sam2.modeling` package
    (imports lazily, stubbing hydra)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("hydra", initialize_config_module=lambda *a, **k: None,
          compose=lambda *a, **k: None)
    _stub("hydra.utils", instantiate=lambda *a, **k: None)
    core = _stub("hydra.core")
    gh = _stub("hydra.core.global_hydra")

    class _GH:
        @staticmethod
        def instance():
            class I:
                def is_initialized(self):
                    return True
            return I()

    gh.GlobalHydra = _GH
    core.global_hydra = gh
    _stub("iopath")
    _stub("iopath.common")
    _stub("iopath.common.file_io", g_pathmgr=None)

    import importlib
    return importlib.import_module("model.segment_anything_2.sam2.modeling")
