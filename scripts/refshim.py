"""Import shim for running the PyTorch reference at /root/reference as a
measurement/oracle target outside pytest.

Mirrors tests/conftest.py:_install_reference_shim — registers synthetic parent
packages pointing into the reference tree and stubs third-party modules absent
from this environment. The reference is only imported and *called*; never
copied.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for pkg in ["k_diffusion", "k_diffusion.models", "condition",
                "condition.diffpir_utils", "condition.dps_utils",
                "motionblur"]:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [os.path.join(REFERENCE_ROOT, *pkg.split("."))]
            mod.__package__ = pkg
            sys.modules[pkg] = mod
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
    tv = _stub_module("torchvision")
    import torch as _torch
    tv.torch = _torch
    _stub_module("torchvision.transforms")
    tv.transforms = sys.modules["torchvision.transforms"]
    _stub_module("torchvision.transforms.functional")
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
