"""SAM-1 image predictor + automatic mask generator: unit behavior and
golden parity against the reference SamPredictor / SamAutomaticMaskGenerator
(driven end-to-end with torchvision shims as the oracle)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import SAM1Config
from videoglamm_tpu.io.import_torch import import_sam1
from videoglamm_tpu.models.sam1 import SAM1
from videoglamm_tpu.models.sam1_predictor import (SAM1AutomaticMaskGenerator,
                                                  SAM1ImagePredictor,
                                                  preprocess_shape)

CFG = SAM1Config(image_size=64, encoder_embed_dim=32, encoder_depth=3,
                 encoder_num_heads=2, encoder_global_attn_indexes=(1,),
                 window_size=2, prompt_embed_dim=32, with_itm=False)


@pytest.fixture(scope="module")
def tiny():
    model = SAM1(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32)
    E = CFG.image_size // 16

    def init_all(mdl):
        # exercise every prompt path so mask-conv params exist
        emb = mdl.forward_image(x)
        sparse, dense = mdl.prompt_encoder(
            points=(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32)),
            boxes=jnp.zeros((1, 4)),
            masks=jnp.zeros((1, 4 * E, 4 * E, 1)),
            text_embeds=jnp.zeros((1, 1, CFG.prompt_embed_dim)))
        pe = mdl.prompt_encoder.get_dense_pe()
        return mdl.mask_decoder(emb, pe, sparse, dense, True)

    params = {"params": model.init(jax.random.PRNGKey(0),
                                   method=init_all)["params"]}
    return model, params


def test_preprocess_shape():
    assert preprocess_shape(480, 640, 1024) == (768, 1024)
    assert preprocess_shape(640, 480, 1024) == (1024, 768)
    assert preprocess_shape(64, 64, 64) == (64, 64)


def test_predictor_shapes_and_rounds(tiny):
    model, params = tiny
    pred = SAM1ImagePredictor(model, params)
    with pytest.raises(AssertionError):
        pred.predict(point_coords=np.array([[5.0, 5.0]]),
                     point_labels=np.array([1]))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(48, 57, 3), dtype=np.uint8)
    pred.set_image(img)
    E4 = 4 * (CFG.image_size // 16)
    masks, ious, low = pred.predict(
        point_coords=np.array([[30.0, 20.0]]), point_labels=np.array([1]))
    assert masks.shape == (3, 48, 57) and masks.dtype == bool
    assert ious.shape == (3,) and low.shape == (3, E4, E4)
    # box + mask-input refinement round, single-mask
    best = int(np.argmax(ious))
    m2, i2, l2 = pred.predict(
        box=np.array([5.0, 5.0, 40.0, 40.0]),
        mask_input=low[best:best + 1], multimask_output=False,
        return_logits=True)
    assert m2.shape == (1, 48, 57) and m2.dtype != bool
    emb = pred.get_image_embedding()
    E = CFG.image_size // 16
    assert emb.shape == (1, E, E, CFG.prompt_embed_dim)
    assert pred.get_image_embedding(channels_first=True).shape == \
        (1, CFG.prompt_embed_dim, E, E)
    pred.reset_image()
    assert not pred._is_image_set


def test_amg_smoke(tiny):
    model, params = tiny
    gen = SAM1AutomaticMaskGenerator(
        model, params, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, box_nms_thresh=1.0)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(40, 52, 3), dtype=np.uint8)
    anns = gen.generate(img)
    assert len(anns) == 16 * 3
    for a in anns:
        assert a["segmentation"].shape == (40, 52)
        assert a["area"] == int(a["segmentation"].sum())


# ---------------------------------------------------------------------------
# golden parity
# ---------------------------------------------------------------------------

def _install_tv_shims():
    """Real torchvision shims (resize/to_pil_image + ops.boxes NMS) over the
    None-stubs test_sam1_golden._load_ref registers. The resize shim runs
    torch antialiased bilinear WITHOUT the PIL uint8 re-quantization, so the
    oracle matches our float matrix-resize contract (same approach as the
    SAM-2 image-predictor golden)."""
    import torch
    import torch.nn.functional as F

    def to_pil_image(x):
        return x

    def resize(img, size):
        t = torch.from_numpy(np.ascontiguousarray(img)).float()
        t = t.permute(2, 0, 1)[None]
        out = F.interpolate(t, tuple(size), mode="bilinear",
                            align_corners=False, antialias=True)
        return out[0].permute(1, 2, 0).numpy()

    tf = sys.modules["torchvision.transforms.functional"]
    tf.resize, tf.to_pil_image = resize, to_pil_image
    # the reference transforms module may ALREADY be imported with the
    # earlier None-stub bound into its namespace (`from torchvision...
    # import resize` at import time) — patch the bound names too
    rtf = sys.modules.get("model.segment_anything.utils.transforms")
    if rtf is not None:
        rtf.resize, rtf.to_pil_image = resize, to_pil_image

    from test_amg import _stub_torchvision_ops
    _stub_torchvision_ops()
    # same late-binding hazard for NMS: reference AMG modules imported
    # earlier (package __init__ side effects) carry whatever batched_nms
    # was registered at that moment
    bx = sys.modules["torchvision.ops.boxes"]
    for name in ("model.segment_anything.automatic_mask_generator",
                 "model.segment_anything_2.sam2.automatic_mask_generator"):
        m = sys.modules.get(name)
        if m is not None:
            m.batched_nms, m.box_area = bx.batched_nms, bx.box_area


def _build_ref_sam():
    from test_sam1_golden import _load_ref, ref_sam as _fixture  # noqa: F401
    _load_ref()
    _install_tv_shims()
    import torch
    from functools import partial
    from model.segment_anything.modeling.image_encoder import ImageEncoderViT
    from model.segment_anything.modeling.mask_decoder import CustomMaskDecoder
    from model.segment_anything.modeling.prompt_encoder import PromptEncoder
    from model.segment_anything.modeling.sam import Sam
    from model.segment_anything.modeling.transformer import TwoWayTransformer

    torch.manual_seed(0)
    cfg = CFG
    enc = ImageEncoderViT(
        depth=cfg.encoder_depth, embed_dim=cfg.encoder_embed_dim,
        img_size=cfg.image_size, mlp_ratio=4,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        num_heads=cfg.encoder_num_heads, patch_size=16, qkv_bias=True,
        use_rel_pos=True,
        global_attn_indexes=cfg.encoder_global_attn_indexes,
        window_size=cfg.window_size, out_chans=cfg.prompt_embed_dim)
    e = cfg.image_size // 16
    pe = PromptEncoder(embed_dim=cfg.prompt_embed_dim,
                       image_embedding_size=(e, e),
                       input_image_size=(cfg.image_size, cfg.image_size),
                       mask_in_chans=16)
    dec = CustomMaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2,
                                      embedding_dim=cfg.prompt_embed_dim,
                                      mlp_dim=2048, num_heads=8),
        transformer_dim=cfg.prompt_embed_dim, iou_head_depth=3,
        iou_head_hidden_dim=256)
    with torch.no_grad():
        enc.pos_embed.normal_(std=0.5)
        for b in enc.blocks:
            b.attn.rel_pos_h.normal_(std=0.5)
            b.attn.rel_pos_w.normal_(std=0.5)

    # latent reference bugs worked around so the fork's own SamPredictor
    # executes: (a) CustomMaskDecoder returns 3 values where SamPredictor
    # unpacks 2 — wrap to the vanilla 2-tuple; (b) the fork's PromptEncoder
    # made text_embeds a required positional
    class Dec2(torch.nn.Module):
        def __init__(self, d):
            super().__init__()
            self.inner = d

        def forward(self, **kw):
            m, i, _ = self.inner(**kw)
            return m, i

        def state_dict(self, *a, **k):
            return self.inner.state_dict(*a, **k)

    pe_fwd = pe.forward
    pe.forward = lambda points=None, boxes=None, masks=None, \
        text_embeds=None: pe_fwd(points, boxes, masks, text_embeds)

    sam = Sam(image_encoder=enc, prompt_encoder=pe, mask_decoder=Dec2(dec),
              pixel_mean=[123.675, 116.28, 103.53],
              pixel_std=[58.395, 57.12, 57.375])
    sam.eval()

    sd = {}
    for name, mod in (("image_encoder", enc), ("prompt_encoder", pe),
                      ("mask_decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return sam, sd


@pytest.mark.golden
@pytest.mark.slow
def test_sam1_predictor_golden():
    import torch
    sam, sd = _build_ref_sam()
    from model.segment_anything.predictor import SamPredictor
    ref_pred = SamPredictor(sam)

    model = SAM1(CFG, dtype=jnp.float32)
    params = {"params": import_sam1(sd, CFG)}
    pred = SAM1ImagePredictor(model, params)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(49, 61, 3), dtype=np.uint8)
    with torch.no_grad():
        ref_pred.set_image(img)
    pred.set_image(img)

    cases = [
        dict(point_coords=np.array([[30.0, 20.0]]),
             point_labels=np.array([1]), multimask_output=True),
        dict(point_coords=np.array([[30.0, 20.0], [50.0, 40.0]]),
             point_labels=np.array([1, 0]), multimask_output=False),
        dict(box=np.array([8.0, 6.0, 52.0, 42.0]), multimask_output=True),
        dict(box=np.array([8.0, 6.0, 52.0, 42.0]),
             point_coords=np.array([[30.0, 20.0]]),
             point_labels=np.array([1]), multimask_output=False),
    ]
    prev_low = None
    for i, kw in enumerate(cases):
        if i == 1 and prev_low is not None:
            kw = dict(kw, mask_input=prev_low[:1])
        with torch.no_grad():
            r_masks, r_ious, r_low = ref_pred.predict(return_logits=True,
                                                      **kw)
        masks, ious, low = pred.predict(return_logits=True, **kw)
        assert masks.shape == r_masks.shape, (masks.shape, r_masks.shape)
        scale = max(np.abs(r_low).max(), 1.0)
        assert np.abs(low - r_low).max() / scale < 2e-2, f"case {i}"
        assert np.abs(ious - r_ious).max() < 2e-2, f"case {i}"
        mscale = max(np.abs(r_masks).max(), 1.0)
        assert np.abs(masks - r_masks).max() / mscale < 3e-2, f"case {i}"
        prev_low = low


@pytest.mark.golden
@pytest.mark.slow
def test_sam1_amg_golden():
    import torch
    sam, sd = _build_ref_sam()
    orig_script = torch.jit.script
    torch.jit.script = lambda m, *a, **k: m
    try:
        from model.segment_anything.automatic_mask_generator import \
            SamAutomaticMaskGenerator as RefAMG
        kw = dict(points_per_side=4, points_per_batch=8,
                  pred_iou_thresh=0.0, stability_score_thresh=0.0,
                  box_nms_thresh=1.0)
        ref_amg = RefAMG(sam, **kw)
    finally:
        torch.jit.script = orig_script

    model = SAM1(CFG, dtype=jnp.float32)
    params = {"params": import_sam1(sd, CFG)}
    gen = SAM1AutomaticMaskGenerator(model, params, **kw)

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(41, 57, 3), dtype=np.uint8)
    with torch.no_grad():
        want = ref_amg.generate(img)
    got = gen.generate(img)
    assert len(got) == len(want) == 16 * 3

    def key(a):
        return (round(a["point_coords"][0][0], 3),
                round(a["point_coords"][0][1], 3), a["area"])

    got = sorted(got, key=key)
    want = sorted(want, key=key)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["point_coords"], w["point_coords"],
                                   atol=1e-4)
        assert abs(g["predicted_iou"] - w["predicted_iou"]) < 2e-2
        assert abs(g["stability_score"] - w["stability_score"]) < 2e-2
        gm, wm = g["segmentation"], w["segmentation"]
        union = (gm | wm).sum()
        iou = (gm & wm).sum() / union if union else 1.0
        assert iou > 0.97, f"mask IoU {iou:.3f} at point {key(g)}"
        np.testing.assert_allclose(g["bbox"], w["bbox"], atol=3)
