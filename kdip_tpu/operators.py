"""Measurement operators: y = A x + n, with A^T, as JAX pytrees.

TPU-native redesign of `condition/measurements.py`. The reference's operators
are stateful nn.Modules that mutate `self.pre_calculated` on forward
(measurements.py:108, 145, 184) and return variable-length flattened
measurements — both incompatible with jit/vmap. Here each operator is an
immutable `flax.struct` pytree carrying its precomputed spectra (OTFs, resize
matrices, masks), and a `Measurement` pytree carries everything per-image the
guidance step needs, so the whole guided sampler compiles once and `vmap`
over measurements lifts the reference's batch=1 restriction.

All images are NHWC in [-1, 1]. Randomness is explicit via keys.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .ops import fft as offt
from .ops import kernels as okernels
from .ops import resize as oresize


class Measurement(struct.PyTreeNode):
    """Per-image measurement state carried through the guided sampler.

    y: measurement in image layout ([B, h, w, C]). The reference additionally
    caches FBFy = FBC * fft2(S^T y) on the operator (utils_sisr.py:94-95,
    measurements.py:108/145/184); here that spectrum is recomputed inside the
    jitted program where needed (one fused FFT per trajectory) so the pytree
    carries no complex leaves — see BlurOperator for why.
    """
    y: jnp.ndarray


# ---------------------------------------------------------------------------
# Operator registry (ref: measurements.py:24-39)
# ---------------------------------------------------------------------------

__OPERATOR__: Dict[str, Callable] = {}


def register_operator(name: str):
    def wrapper(builder):
        if name in __OPERATOR__:
            raise NameError(f"operator name {name!r} registered twice")
        __OPERATOR__[name] = builder
        return builder
    return wrapper


def get_operator(name: str, **kwargs):
    """Builds an operator from a config dict (the reference's YAML fields,
    ref: configs/*_config.yaml). Unknown names raise, like measurements.py:36-39."""
    if name not in __OPERATOR__:
        raise NameError(f"no operator registered under {name!r}")
    kwargs.pop("device", None)
    return __OPERATOR__[name](**kwargs)


def _nchw_shape_to_hw(in_shape) -> Tuple[int, int]:
    """The reference YAMLs carry NCHW in_shape tuples (1, 3, H, W)."""
    return int(in_shape[-2]), int(in_shape[-1])


class LinearOperator(struct.PyTreeNode):
    """Base: forward (A), transpose (A^T), measure (y = Ax + sigma_s n)."""
    sigma_s: jnp.ndarray

    @property
    def name(self) -> str:
        raise NotImplementedError

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def transpose(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def measure(self, x: jnp.ndarray, key) -> Measurement:
        y = self.forward(x)
        y = y + self.sigma_s * jax.random.normal(key, y.shape, y.dtype)
        return self.finalize(y)

    def finalize(self, y: jnp.ndarray) -> Measurement:
        """Wraps an existing measurement, attaching precomputed spectra."""
        return Measurement(y=y)


class DenoiseOperator(LinearOperator):
    """Identity A (pure denoising) (ref: measurements.py:55-70)."""

    @property
    def name(self):
        return "noise"

    def forward(self, x):
        return x

    def transpose(self, y):
        return y


@register_operator("noise")
def _build_denoise(sigma_s: float = 0.0, **_):
    return DenoiseOperator(sigma_s=jnp.float32(sigma_s))


class ColorizationOperator(LinearOperator):
    """A = channel mean (ref: measurements.py:73-83). A^T spreads y/3."""

    @property
    def name(self):
        return "colorization"

    def forward(self, x):
        return jnp.mean(x, axis=-1, keepdims=True)

    def transpose(self, y):
        return jnp.repeat(y, 3, axis=-1) / 3.0


@register_operator("colorization")
def _build_colorization(sigma_s: float = 0.05, **_):
    return ColorizationOperator(sigma_s=jnp.float32(sigma_s))


class BlurOperator(LinearOperator):
    """Circular-convolution blur via precomputed OTF
    (ref: measurements.py:125-199, both gaussian and motion variants).

    The OTF is stored as separate real/imag float arrays (FB_re, FB_im) and
    assembled into complex64 inside traced code: complex-valued constants
    cannot be embedded in jitted programs on TPU transports that lack
    complex device<->host transfer (complex *arguments* and on-device
    complex compute are fine).
    """
    kernel: jnp.ndarray  # [kh, kw]
    FB_re: jnp.ndarray   # [H, W] float32
    FB_im: jnp.ndarray
    _name: str = struct.field(pytree_node=False, default="gaussian_blur")

    @property
    def name(self):
        return self._name

    @property
    def FB(self):
        return jax.lax.complex(jnp.asarray(self.FB_re), jnp.asarray(self.FB_im))

    @property
    def FBC(self):
        return jax.lax.complex(jnp.asarray(self.FB_re), -jnp.asarray(self.FB_im))

    @property
    def F2B(self):
        return jnp.asarray(self.FB_re) ** 2 + jnp.asarray(self.FB_im) ** 2

    def forward(self, x):
        return offt.ifft2(self.FB[..., :, :, None] * offt.fft2(x)).real

    def transpose(self, y):
        return offt.ifft2(self.FBC[..., :, :, None] * offt.fft2(y)).real

    def finalize(self, y):
        return Measurement(y=y)

    @property
    def pre_calculated(self):
        return self.FB, self.FBC, self.F2B

    def fbfy(self, y):
        """FBC * fft2(S^T y) (ref: utils_sisr.py:94-95); call inside jit."""
        return self.FBC[..., :, :, None] * offt.fft2(y)


def _build_blur(name: str, in_shape=(1, 3, 256, 256), kernel_size: int = 61,
                intensity: float = 3.0, sigma_s: float = 0.05,
                kernel: Optional[np.ndarray] = None,
                kernel_path: Optional[str] = None, seed: Optional[int] = None,
                **_):
    H, W = _nchw_shape_to_hw(in_shape)
    if kernel is None:
        if kernel_path is not None:
            kernel = okernels.load_kernel_npy(kernel_path)
        elif name == "gaussian_blur":
            kernel = okernels.gaussian_kernel(kernel_size, intensity)
        else:
            kernel = okernels.motion_blur_kernel(kernel_size, intensity, seed=seed)
    kernel = np.asarray(kernel, np.float32)
    FB = offt.psf_to_otf_np(kernel, (H, W))
    return BlurOperator(sigma_s=jnp.float32(sigma_s), kernel=jnp.asarray(kernel),
                        FB_re=FB.real.astype(np.float32),
                        FB_im=FB.imag.astype(np.float32), _name=name)


@register_operator("gaussian_blur")
def _build_gaussian_blur(**kw):
    return _build_blur("gaussian_blur", **kw)


@register_operator("motion_blur")
def _build_motion_blur(**kw):
    kw.setdefault("intensity", 0.5)
    return _build_blur("motion_blur", **kw)


class SuperResolutionOperator(LinearOperator):
    """A = exact antialiased bicubic downsample (ResizeRight), with the FFT
    kernel representation for transpose / mat solving
    (ref: measurements.py:86-122).

    Note the reference's `transpose` is the adjoint of the *FFT* operator
    (downsample(blur(x))), not of the bicubic Resizer forward — we mirror
    that behavior for parity (measurements.py:113-119).
    """
    Mh: jnp.ndarray  # [h, H] bicubic row-resize matrix
    Mw: jnp.ndarray  # [w, W]
    kernel: jnp.ndarray
    FB_re: jnp.ndarray
    FB_im: jnp.ndarray
    scale_factor: int = struct.field(pytree_node=False, default=4)

    @property
    def name(self):
        return "super_resolution"

    @property
    def FB(self):
        return jax.lax.complex(jnp.asarray(self.FB_re), jnp.asarray(self.FB_im))

    @property
    def FBC(self):
        return jax.lax.complex(jnp.asarray(self.FB_re), -jnp.asarray(self.FB_im))

    @property
    def F2B(self):
        return jnp.asarray(self.FB_re) ** 2 + jnp.asarray(self.FB_im) ** 2

    def forward(self, x):
        x = jnp.einsum("oh,bhwc->bowc", self.Mh, x)
        return jnp.einsum("ow,bhwc->bhoc", self.Mw, x)

    def transpose(self, y):
        FBFy = self.FBC[..., :, :, None] * offt.fft2(offt.upsample(y, self.scale_factor))
        return offt.ifft2(FBFy).real

    def finalize(self, y):
        return Measurement(y=y)

    @property
    def pre_calculated(self):
        return self.FB, self.FBC, self.F2B

    def fbfy(self, y):
        """FBC * fft2(S^T y); call inside jit."""
        return self.FBC[..., :, :, None] * offt.fft2(offt.upsample(y, self.scale_factor))


@register_operator("super_resolution")
def _build_super_resolution(in_shape=(1, 3, 256, 256), scale_factor: int = 4,
                            sigma_s: float = 0.05,
                            kernel: Optional[np.ndarray] = None,
                            kernel_path: Optional[str] = None, **_):
    H, W = _nchw_shape_to_hw(in_shape)
    sf = int(scale_factor)
    _, (Mh, Mw) = oresize.make_resizer((H, W), 1.0 / sf)
    if kernel is None:
        if kernel_path is not None:
            kernel = okernels.load_bicubic_mat(kernel_path, sf)
        else:
            kernel = okernels.bicubic_kernel(sf)
    kernel = np.asarray(kernel, np.float32)
    FB = offt.psf_to_otf_np(kernel, (H, W))
    return SuperResolutionOperator(sigma_s=jnp.float32(sigma_s), Mh=Mh, Mw=Mw,
                                   kernel=jnp.asarray(kernel),
                                   FB_re=FB.real.astype(np.float32),
                                   FB_im=FB.imag.astype(np.float32),
                                   scale_factor=sf)


class InpaintingOperator(LinearOperator):
    """A = fixed-shape masking (ref: measurements.py:202-244).

    The measurement keeps image layout (y = mask * (x + n)); the reference's
    variable-length flattened view is replaced by mask-aware math downstream
    (static shapes for XLA).
    """
    mask: jnp.ndarray  # [H, W, C] (or [1, H, W, C]) in {0, 1}

    @property
    def name(self):
        return "inpainting"

    def forward(self, x):
        return x * self.mask

    def transpose(self, y):
        return y * self.mask

    def measure(self, x, key):
        # noise applied before masking, like measurements.py:211-219
        y = (x + self.sigma_s * jax.random.normal(key, x.shape, x.dtype)) * self.mask
        return Measurement(y=y)


@register_operator("inpainting")
def _build_inpainting(sigma_s: float = 0.05, mask_opt: Optional[dict] = None,
                      mask: Optional[np.ndarray] = None, seed: Optional[int] = None,
                      **_):
    if mask is None:
        mask = generate_mask(seed=seed, **(mask_opt or {}))
    return InpaintingOperator(sigma_s=jnp.float32(sigma_s),
                              mask=jnp.asarray(mask, jnp.float32))


def generate_mask(mask_type: str = "random", mask_len_range=None,
                  mask_prob_range=None, image_size: int = 256, margin=(16, 16),
                  num_channels: int = 3, seed: Optional[int] = None) -> np.ndarray:
    """Inpainting mask synthesis (ref: measurements.py:247-319 MaskGenerator).

    Host-side numpy (masks are fixed per experiment). Returns [H, W, C].
    """
    rng = np.random.RandomState(seed)
    assert mask_type in ["box", "random", "both", "extreme"]
    if mask_type == "random":
        l, h = mask_prob_range
        prob = rng.uniform(l, h)
        total = image_size ** 2
        mask_vec = np.ones(total, dtype=np.float32)
        samples = rng.choice(total, int(total * prob), replace=False)
        mask_vec[samples] = 0
        mask = mask_vec.reshape(image_size, image_size)[..., None]
        return np.repeat(mask, num_channels, axis=-1)
    # box / extreme: centered square box (the reference fixes the center,
    # measurements.py:310-313)
    l, h = (int(mask_len_range[0]), int(mask_len_range[1]))
    mask_h = rng.randint(l, h)
    mask_w = rng.randint(l, h)
    margin_height, margin_width = margin
    maxt = image_size - margin_height - mask_h
    maxl = image_size - margin_width - mask_w
    t = (margin_height + maxt) // 2
    lft = (margin_width + maxl) // 2
    mask = np.ones((image_size, image_size, num_channels), dtype=np.float32)
    mask[t:t + mask_h, lft:lft + mask_w, :] = 0
    if mask_type == "extreme":
        mask = 1.0 - mask
    return mask


# ---------------------------------------------------------------------------
# Nonlinear operators (ref: measurements.py:322-367)
# ---------------------------------------------------------------------------

class PhaseRetrievalOperator(struct.PyTreeNode):
    """|F(pad(x))| (ref: measurements.py:330-339)."""
    pad: int = struct.field(pytree_node=False, default=32)
    sigma_s: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.05))

    @property
    def name(self):
        return "phase_retrieval"

    def forward(self, x):
        p = self.pad
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        # centered 2-D FFT magnitude (ref: dps_utils/img_utils.py:26 fft2_m)
        f = jnp.fft.fftshift(jnp.fft.fftn(jnp.fft.ifftshift(xp, axes=(1, 2)),
                                          axes=(1, 2)), axes=(1, 2))
        return jnp.abs(f)

    def project(self, x, measurement):
        return x + measurement - self.forward(x)

    def measure(self, x, key):
        y = self.forward(x)
        y = y + self.sigma_s * jax.random.normal(key, y.shape, y.dtype)
        return Measurement(y=y)


@register_operator("phase_retrieval")
def _build_phase_retrieval(oversample: float = 1.0, sigma_s: float = 0.05, **_):
    return PhaseRetrievalOperator(pad=int((oversample / 8.0) * 256),
                                  sigma_s=jnp.float32(sigma_s))


class NonlinearBlurOperator(struct.PyTreeNode):
    """Learned nonlinear blur (ref: measurements.py:341-367).

    The reference delegates to the external bkse KernelWizard network (not
    part of the reference repo); here the blur network is any callable
    `blur_apply(x01, kernel) -> x01` over [0, 1]-scaled NHWC images plus its
    random kernel shape — e.g. a converted KernelWizard or any Flax module
    closure. The [-1,1] <-> [0,1] rescaling and the N(0, 1.2^2) random
    kernel draw match the reference (measurements.py:362-367).
    """
    sigma_s: jnp.ndarray
    blur_apply: Callable = struct.field(pytree_node=False, default=None)
    kernel_shape: Tuple[int, ...] = struct.field(pytree_node=False,
                                                 default=(1, 2, 2, 512))

    @property
    def name(self):
        return "nonlinear_blur"

    def forward(self, x, key=None):
        if key is None:
            key = jax.random.key(0)
        random_kernel = jax.random.normal(key, self.kernel_shape) * 1.2
        x01 = (x + 1.0) / 2.0
        blurred = self.blur_apply(x01, random_kernel)
        return jnp.clip(blurred * 2.0 - 1.0, -1, 1)

    def project(self, x, measurement):
        return x + measurement - self.forward(x)

    def measure(self, x, key):
        k1, k2 = jax.random.split(key)
        y = self.forward(x, k1)
        y = y + self.sigma_s * jax.random.normal(k2, y.shape, y.dtype)
        return Measurement(y=y)


@register_operator("nonlinear_blur")
def _build_nonlinear_blur(blur_apply=None, kernel_shape=(1, 2, 2, 512),
                          sigma_s: float = 0.05, **_):
    assert blur_apply is not None, \
        "nonlinear_blur needs a blur network callable (the reference loads " \
        "the external bkse KernelWizard; pass its converted apply fn)"
    return NonlinearBlurOperator(sigma_s=jnp.float32(sigma_s),
                                 blur_apply=blur_apply,
                                 kernel_shape=tuple(kernel_shape))


# ---------------------------------------------------------------------------
# Noise models (ref: measurements.py:374-457)
# ---------------------------------------------------------------------------

__NOISE__: Dict[str, Callable] = {}


def register_noise(name: str):
    def wrapper(fn):
        __NOISE__[name] = fn
        return fn
    return wrapper


def get_noise(name: str, **kwargs):
    if name not in __NOISE__:
        raise NameError(f"no operator registered under {name!r}")
    fn = __NOISE__[name]
    out = lambda data, key: fn(data, key, **kwargs)
    out.__name__ = name
    return out


@register_noise("clean")
def clean_noise(data, key):
    return data


@register_noise("gaussian")
def gaussian_noise(data, key, sigma: float = 0.05):
    return data + sigma * jax.random.normal(key, data.shape, data.dtype)


@register_noise("poisson")
def poisson_noise(data, key, rate: float = 1.0):
    """Poisson shot noise on [0, 255]-scaled intensities
    (ref: measurements.py:413-434 'version 3')."""
    data01 = jnp.clip((data + 1.0) / 2.0, 0, 1)
    lam = data01 * 255.0 * rate
    noisy = jax.random.poisson(key, lam).astype(data.dtype) / 255.0 / rate
    return jnp.clip(noisy * 2.0 - 1.0, -1, 1)
