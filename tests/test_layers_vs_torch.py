"""JAX layer numerics vs the independent torch oracle (fp32, tight tol)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.models import layers as L
import torch_ref as T

F32 = jnp.float32


def _x(rng, shape):
    return rng.standard_normal(shape, dtype=np.float32)


def _close(a, b, tol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    denom = np.maximum(np.abs(b).max(), 1e-3)
    err = np.abs(a - b).max() / denom
    assert err < tol, f"rel err {err}"


def _np_params(p):
    return jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, p)


def test_conv_stride1_stride2(rng):
    kg = L.KeyGen(jax.random.key(0))
    p = L.conv_init(kg, 6, 8, 3)
    x = _x(rng, (2, 16, 16, 6))
    for s in (1, 2):
        y = L.conv_apply(p, jnp.asarray(x), stride=s, dtype=F32)
        yt = T.to_nhwc(T.conv(_np_params(p), T.to_nchw(x), stride=s))
        _close(y, yt)


def test_conv_even_input_stride2_offsets(rng):
    """Stride-2 sampling offsets are where XLA SAME differs from torch pad=1."""
    kg = L.KeyGen(jax.random.key(1))
    p = L.conv_init(kg, 3, 4, 3)
    x = _x(rng, (1, 64, 64, 3))
    y = L.conv_apply(p, jnp.asarray(x), stride=2, dtype=F32)
    yt = T.to_nhwc(T.conv(_np_params(p), T.to_nchw(x), stride=2))
    assert y.shape == (1, 32, 32, 4)
    _close(y, yt)


def test_dwconv(rng):
    kg = L.KeyGen(jax.random.key(2))
    p = L.dwconv_init(kg, 8)
    x = _x(rng, (1, 10, 10, 8))
    y = L.dwconv_apply(p, jnp.asarray(x), dtype=F32)
    yt = T.to_nhwc(T.dwconv(_np_params(p), T.to_nchw(x)))
    _close(y, yt)


def test_maxpool_same(rng):
    x = _x(rng, (1, 12, 12, 4))
    y = L._maxpool_same(jnp.asarray(x), 5)
    import torch.nn.functional as TF
    yt = T.to_nhwc(TF.max_pool2d(T.to_nchw(x), 5, 1, 2))
    _close(y, yt)


@pytest.mark.parametrize("c3k_flag", [False, True])
def test_c3k2(rng, c3k_flag):
    kg = L.KeyGen(jax.random.key(3))
    p = L.c3k2_init(kg, 16, 24, n=2, c3k=c3k_flag, e=0.5)
    x = _x(rng, (1, 8, 8, 16))
    y = L.c3k2_apply(p, jnp.asarray(x), shortcut=True, dtype=F32)
    yt = T.to_nhwc(T.c3k2(_np_params(p), T.to_nchw(x), shortcut=True))
    _close(y, yt)


def test_sppf(rng):
    kg = L.KeyGen(jax.random.key(4))
    p = L.sppf_init(kg, 16, 16)
    x = _x(rng, (1, 8, 8, 16))
    y = L.sppf_apply(p, jnp.asarray(x), dtype=F32)
    yt = T.to_nhwc(T.sppf(_np_params(p), T.to_nchw(x)))
    _close(y, yt)


def test_attention(rng):
    kg = L.KeyGen(jax.random.key(5))
    p = L.attention_init(kg, 64, num_heads=1)
    x = _x(rng, (2, 5, 5, 64))
    y = L.attention_apply(p, jnp.asarray(x), num_heads=1, dtype=F32)
    yt = T.to_nhwc(T.attention(_np_params(p), T.to_nchw(x), 1))
    _close(y, yt)


def test_c2psa(rng):
    kg = L.KeyGen(jax.random.key(6))
    p = L.c2psa_init(kg, 128, n=1)
    x = _x(rng, (1, 6, 6, 128))
    y = L.c2psa_apply(p, jnp.asarray(x), dtype=F32)
    yt = T.to_nhwc(T.c2psa(_np_params(p), T.to_nchw(x)))
    _close(y, yt)


def test_proto(rng):
    kg = L.KeyGen(jax.random.key(7))
    p = L.proto_init(kg, 16, c_=24, nm=8)
    x = _x(rng, (1, 8, 8, 16))
    y = L.proto_apply(p, jnp.asarray(x), dtype=F32)
    yt = T.to_nhwc(T.proto(_np_params(p), T.to_nchw(x)))
    assert y.shape == (1, 16, 16, 8)
    _close(y, yt)


def test_upsample_nearest(rng):
    x = _x(rng, (1, 4, 6, 3))
    y = L.upsample2x_nearest(jnp.asarray(x))
    yt = T.to_nhwc(T.upsample2x(T.to_nchw(x)))
    _close(y, yt)


def test_conv0_s2d_matches_plain(rng):
    """Space-to-depth stem == plain k3 s2 conv (exact weight transform)."""
    kg = L.KeyGen(jax.random.key(9))
    p = L.conv_init(kg, 3, 16, 3)
    x = jnp.asarray(_x(rng, (2, 64, 64, 3)))
    ref = L.conv_apply(p, x, stride=2, dtype=F32)
    s2d = L.conv0_s2d_apply(p, x, dtype=F32)
    _close(s2d, ref, tol=1e-5)
