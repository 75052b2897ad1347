"""Test config: force an 8-virtual-device CPU mesh before JAX initializes.

Benchmarks run on the real TPU chip; unit tests run on CPU so that
multi-device sharding paths can be exercised without hardware.
"""

import os
import sys

# Note: on axon hosts, platform_guard.py (loaded via pytest.ini addopts)
# re-execs pytest onto CPU before capture starts; these are fallbacks for
# plain environments.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

import types  # noqa: E402

import pytest  # noqa: E402


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


def _stub_module(name, **attrs):
    """Registers an empty placeholder module so reference imports resolve.

    Gives the stub a real ModuleSpec: importlib.util.find_spec(name) (used
    e.g. by transformers' optional-dependency probing for torchvision)
    raises `ValueError: __spec__ is None` on spec-less modules otherwise."""
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_reference_shim():
    """Makes reference subpackages importable without executing their
    `__init__.py` (which pulls in deps absent here: torchsde, skimage, ...).

    We register synthetic parent packages whose __path__ points into the
    reference tree, then stub the unavailable third-party modules that leaf
    modules import at top level. The reference code itself is only ever
    *imported and called* as a numerical oracle — never copied.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for pkg in ["k_diffusion", "k_diffusion.models", "condition",
                "condition.diffpir_utils", "condition.dps_utils", "motionblur",
                # utils_inpaint.py does `from diffpir_utils import ...`
                # (absolute); alias the same directory under that name too.
                "diffpir_utils"]:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            path = ("condition/diffpir_utils" if pkg == "diffpir_utils"
                    else os.path.join(*pkg.split(".")))
            mod.__path__ = [os.path.join(REFERENCE_ROOT, path)]
            mod.__package__ = pkg
            sys.modules[pkg] = mod
    # guided_diffusion/__init__.py is a bare docstring — safe to import normally.
    # Third-party stubs (only what top-level imports touch):
    _stub_module("torchsde")
    _stub_module("torchdiffeq", odeint=None)
    gpy = _stub_module("gpytorch")

    class _FakeLinearOperator:
        def __init__(self, *a, **k):
            self._args = a

    gpy.LinearOperator = _FakeLinearOperator
    _stub_module("gpytorch.distributions", MultivariateNormal=None)
    gpy.distributions = sys.modules["gpytorch.distributions"]
    sk = _stub_module("skimage")
    _stub_module("skimage.transform")
    sk.transform = sys.modules["skimage.transform"]
    _stub_module("pywt")
    _stub_module("jsonmerge")
    try:
        from scipy import io as _sio
        _stub_module("hdf5storage", loadmat=_sio.loadmat)
    except ImportError:
        _stub_module("hdf5storage")
    # scipy >= 1.14 removed the `tol` kwarg of sparse cg (now `rtol`); the
    # reference uses the old spelling (condition.py:343).
    import scipy.sparse.linalg as _ssl
    if not getattr(_ssl.cg, "_kdip_tol_shim", False):
        _orig_cg = _ssl.cg

        def _cg_compat(*args, **kwargs):
            if "tol" in kwargs:
                kwargs["rtol"] = kwargs.pop("tol")
            return _orig_cg(*args, **kwargs)

        _cg_compat._kdip_tol_shim = True
        _ssl.cg = _cg_compat
    _stub_module("blobfile")
    # numpy >= 2.0 removed np.alltrue; the reference's zero_pad uses it.
    import numpy as _np
    if not hasattr(_np, "alltrue"):
        _np.alltrue = _np.all
    tv = _stub_module("torchvision")
    import torch as _torch
    tv.torch = _torch
    _stub_module("torchvision.transforms")
    tv.transforms = sys.modules["torchvision.transforms"]
    _stub_module("torchvision.transforms.functional")
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
    _stub_module("torchvision.utils", make_grid=None)
    tv.utils = sys.modules["torchvision.utils"]
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        mpl = _stub_module("matplotlib")
        _stub_module("matplotlib.pyplot")
        mpl.pyplot = sys.modules["matplotlib.pyplot"]


@pytest.fixture(scope="session")
def reference_path():
    """Puts the PyTorch reference on sys.path for use as a numerical oracle.

    The reference is used read-only, as a test oracle: we instantiate its
    modules with random weights and assert our TPU-native implementation
    produces the same numbers. Skipped when unavailable.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    _install_reference_shim()
    return REFERENCE_ROOT
