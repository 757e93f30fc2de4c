"""SAM-2 image predictor: API behavior + golden parity against the REAL
reference SAM2ImagePredictor (driven end-to-end with a minimal torchvision
shim so the reference transforms execute as the oracle)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import HieraConfig, SAM2Config
from videoglamm_tpu.models.sam2.image_predictor import (
    SAM2ImagePredictor, preprocess_image_square)
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base

CFG = SAM2Config(
    hiera=HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                      global_att_blocks=(4,), window_spec=(4, 2, 2, 2)),
    image_size=128, d_model=32, memory_attention_layers=2,
    memory_attention_dim_feedforward=64, mem_dim=16,
    memory_rope_feat_sizes=(8, 8))


@pytest.fixture(scope="module")
def tiny_predictor():
    model = SAM2Base(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    params = {"params": params["params"]}
    return SAM2ImagePredictor(model, params)


def test_predict_requires_set_image(tiny_predictor):
    with pytest.raises(AssertionError):
        tiny_predictor.predict(point_coords=np.array([[10.0, 10.0]]),
                               point_labels=np.array([1]))


def test_point_prompt_shapes_and_refinement(tiny_predictor):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(97, 123, 3), dtype=np.uint8)
    tiny_predictor.set_image(img)

    masks, ious, low = tiny_predictor.predict(
        point_coords=np.array([[60.0, 40.0]]), point_labels=np.array([1]),
        multimask_output=True)
    E4 = 4 * (CFG.image_size // CFG.backbone_stride)
    assert masks.shape == (3, 97, 123) and masks.dtype == bool
    assert ious.shape == (3,)
    assert low.shape == (3, E4, E4)

    # second click + previous best logits feed back as mask_input
    best = int(np.argmax(ious))
    masks2, ious2, low2 = tiny_predictor.predict(
        point_coords=np.array([[60.0, 40.0], [20.0, 80.0]]),
        point_labels=np.array([1, 0]),
        mask_input=low[best:best + 1], multimask_output=False)
    assert masks2.shape == (1, 97, 123) and ious2.shape == (1,)
    assert np.abs(low2).max() <= 32.0

    # box prompt; return_logits keeps float scores
    logits, _, _ = tiny_predictor.predict(
        box=np.array([10.0, 10.0, 100.0, 90.0]), return_logits=True)
    assert logits.dtype != bool and logits.shape == (3, 97, 123)


def test_batch_predict(tiny_predictor):
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, size=(64, 80, 3), dtype=np.uint8)
            for _ in range(2)]
    tiny_predictor.set_image_batch(imgs)
    masks, ious, lows = tiny_predictor.predict_batch(
        point_coords_batch=[np.array([[30.0, 20.0]]),
                            np.array([[10.0, 50.0]])],
        point_labels_batch=[np.array([1]), np.array([1])])
    assert len(masks) == 2 and masks[0].shape == (3, 64, 80)
    emb = tiny_predictor.get_image_embedding()
    E = CFG.image_size // CFG.backbone_stride
    assert emb.shape == (2, E, E, CFG.d_model)


# ---------------------------------------------------------------------------
# golden parity
# ---------------------------------------------------------------------------

def _stub_torchvision():
    """Minimal torchvision.transforms so the REFERENCE SAM2Transforms runs
    as the oracle: ToTensor (HWC uint8 -> CHW float/255), antialiased
    bilinear Resize, Normalize. torch.jit.script is bypassed (identity) —
    the oracle's numerics are pure eager torch."""
    import torch
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, x):
            t = torch.from_numpy(np.ascontiguousarray(x))
            return t.permute(2, 0, 1).float() / 255.0

    class Resize(torch.nn.Module):
        def __init__(self, size):
            super().__init__()
            self.size = size

        def forward(self, x):
            return F.interpolate(x[None], self.size, mode="bilinear",
                                 align_corners=False, antialias=True)[0]

    class Normalize(torch.nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def forward(self, x):
            return (x - self.mean) / self.std

    tr.ToTensor, tr.Resize, tr.Normalize = ToTensor, Resize, Normalize
    tv.transforms = tr
    import importlib.machinery
    for m in (tv, tr):
        # real __spec__: transformers' find_spec probe raises on registered
        # modules whose __spec__ is None
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    # if an earlier stub is already registered, make sure it carries the
    # transform classes this oracle needs
    reg = sys.modules["torchvision.transforms"]
    for k, v in (("ToTensor", ToTensor), ("Resize", Resize),
                 ("Normalize", Normalize)):
        if getattr(reg, k, None) is None:
            setattr(reg, k, v)
    sys.modules["torchvision"].transforms = reg


@pytest.mark.golden
@pytest.mark.slow
def test_image_predictor_golden():
    import torch
    from videoglamm_tpu.io.import_torch import import_sam2
    from ref_sam2 import build_reference_sam2

    ref = build_reference_sam2(CFG)
    _stub_torchvision()
    orig_script = torch.jit.script
    torch.jit.script = lambda m, *a, **k: m
    try:
        from model.segment_anything_2.sam2.sam2_image_predictor import \
            SAM2ImagePredictor as RefPredictor
        ref_pred = RefPredictor(ref)
    finally:
        torch.jit.script = orig_script
    E = CFG.image_size // CFG.backbone_stride
    ref_pred._bb_feat_sizes = [(4 * E, 4 * E), (2 * E, 2 * E), (E, E)]
    # latent reference bug: VideoGLaMM's prompt encoder made text_embeds a
    # REQUIRED positional (prompt_encoder.py:153), but its own image
    # predictor still calls it with three kwargs — make it optional so the
    # reference path executes (with no text prompt, as intended)
    pe_fwd = ref.sam_prompt_encoder.forward
    ref.sam_prompt_encoder.forward = \
        lambda points=None, boxes=None, masks=None, text_embeds=None: \
        pe_fwd(points, boxes, masks, text_embeds)

    model = SAM2Base(CFG, dtype=jnp.float32)
    params = {"params": import_sam2(ref.state_dict(), CFG)}
    pred = SAM2ImagePredictor(model, params)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(73, 101, 3), dtype=np.uint8)
    with torch.no_grad():
        ref_pred.set_image(img)
    pred.set_image(img)

    # the preprocessed inputs must match (matrix resize vs torch antialias)
    ours_in = np.asarray(preprocess_image_square(img, CFG.image_size))
    ref_in = ref_pred._transforms(img).permute(1, 2, 0).numpy() * np.array(
        [0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
    ours_unnorm = ours_in * (np.array([58.395, 57.12, 57.375]) / 255.0) + \
        np.array([123.675, 116.28, 103.53]) / 255.0
    assert np.abs(ours_unnorm - ref_in).max() < 1e-4

    cases = [
        dict(point_coords=np.array([[40.0, 30.0]]),
             point_labels=np.array([1]), multimask_output=True),
        dict(point_coords=np.array([[40.0, 30.0], [80.0, 60.0]]),
             point_labels=np.array([1, 0]), multimask_output=False),
        dict(box=np.array([10.0, 8.0, 90.0, 64.0]), multimask_output=True),
        dict(box=np.array([10.0, 8.0, 90.0, 64.0]),
             point_coords=np.array([[40.0, 30.0]]),
             point_labels=np.array([1]), multimask_output=False),
    ]
    prev_low = None
    for i, kw in enumerate(cases):
        if i == 1 and prev_low is not None:
            kw = dict(kw, mask_input=prev_low[:1])
        with torch.no_grad():
            r_masks, r_ious, r_low = ref_pred.predict(
                return_logits=True, **kw)
        masks, ious, low = pred.predict(return_logits=True, **kw)
        assert masks.shape == r_masks.shape, (masks.shape, r_masks.shape)
        scale = max(np.abs(r_low).max(), 1.0)
        assert np.abs(low - r_low).max() / scale < 2e-2, f"case {i}"
        assert np.abs(ious - r_ious).max() < 2e-2, f"case {i}"
        # full-res logits (resize + optional threshold path)
        mscale = max(np.abs(r_masks).max(), 1.0)
        assert np.abs(masks - r_masks).max() / mscale < 3e-2, f"case {i}"
        prev_low = low
