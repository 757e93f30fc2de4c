"""Fused on-device preprocessing parity vs the PIL host pipeline
(data/preprocess.py == the reference's chat.py:382-427 host semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from videoglamm_tpu.data.preprocess import (preprocess_clip,
                                            preprocess_internvideo,
                                            preprocess_sam2)
from videoglamm_tpu.ops.preprocess import (preprocess_sam_stream,
                                           preprocess_streams)
from videoglamm_tpu.ops.resize import pil_resize_matrix


@pytest.mark.parametrize("H,W", [(480, 480), (360, 640), (512, 288)])
def test_streams_match_host_pil(H, W):
    """Device streams track the uint8-PIL host path within PIL's 8-bit
    coefficient quantization (~1/255 pixel -> /std after normalize)."""
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(3, H, W, 3), dtype=np.uint8)

    iv, cl, sam = preprocess_streams(jnp.asarray(frames))
    iv, cl, sam = np.asarray(iv), np.asarray(cl), np.asarray(sam)

    host_iv = preprocess_internvideo(list(frames))
    host_cl = preprocess_clip(list(frames))
    host_sam = preprocess_sam2(list(frames))

    assert iv.shape == host_iv.shape == (3, 224, 224, 3)
    assert cl.shape == host_cl.shape == (3, 336, 336, 3)
    assert sam.shape == host_sam.shape == (3, 1024, 1024, 3)
    # uint8-PIL quantization bound: ~1 pixel unit / std
    np.testing.assert_allclose(iv, host_iv, atol=3e-2)
    np.testing.assert_allclose(cl, host_cl, atol=3e-2)
    np.testing.assert_allclose(sam, host_sam, atol=3e-2)
    # and the typical error must be far below the bound (~0.3 uint8 LSB)
    assert np.abs(iv - host_iv).mean() < 8e-3
    assert np.abs(cl - host_cl).mean() < 8e-3
    assert np.abs(sam - host_sam).mean() < 8e-3

    sam_only = np.asarray(preprocess_sam_stream(jnp.asarray(frames)))
    np.testing.assert_allclose(sam_only, sam, atol=1e-5)


@pytest.mark.parametrize("mode,pil_filter", [("bilinear", "BILINEAR"),
                                             ("bicubic", "BICUBIC")])
@pytest.mark.parametrize("in_size,out_size", [(480, 224), (224, 480),
                                              (640, 336), (97, 64)])
def test_pil_matrix_float_exact(mode, pil_filter, in_size, out_size):
    """pil_resize_matrix is float-exact against PIL mode-'F' resizes (the
    quantization-free form of PIL's filter)."""
    from PIL import Image
    rng = np.random.RandomState(1)
    x = rng.rand(in_size, in_size).astype(np.float32)
    img = Image.fromarray(x)
    want = np.asarray(img.resize((out_size, out_size),
                                 getattr(Image, pil_filter)), np.float32)
    m_h = pil_resize_matrix(in_size, out_size, mode)
    got = m_h @ x @ m_h.T
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
