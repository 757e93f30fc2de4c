"""Inference: KV-cache generation parity vs full recompute (the reference's
use_cache=False semantics), [SEG] hidden alignment, end-to-end pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.models import VideoGLaMM
from videoglamm_tpu.models.multimodal import splice_visual_prefix
from videoglamm_tpu.inference import GroundedInference
from videoglamm_tpu.inference.generate import generate_with_prefix

from test_videoglamm import CFG, make_batch

EOS = 3
MAX_NEW = 6


@pytest.fixture(scope="module")
def setup():
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    return model, params, batch


def test_cached_decode_matches_full_recompute(setup):
    """The cached decode's per-step hidden states must match ONE full no-cache
    forward over the final sequence (the reference's use_cache=False
    semantics, VideoGLaMM.py:798) — teacher-forced so near-tie argmax noise
    can't flip the comparison."""
    model, params, batch = setup
    visual = model.apply(
        params, batch["frames"], batch["context_images"],
        method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b))
    visual = visual[batch["video_idx"]]

    gen = generate_with_prefix(
        model, params, visual, batch["input_ids"], batch["text_lens"],
        max_new_tokens=MAX_NEW, eos_id=EOS)
    got = np.asarray(gen.tokens)
    B = got.shape[0]

    # rebuild the full text sequence with the generated tokens appended at
    # each row's valid length, then run ONE uncached forward
    ids = np.concatenate(
        [np.asarray(batch["input_ids"]), np.zeros((B, MAX_NEW), np.int32)],
        axis=1)
    lens = np.asarray(batch["text_lens"]).copy()
    counts = np.zeros(B, np.int32)
    for b in range(B):
        for j in range(MAX_NEW):
            if got[b, j] == 0 and j >= np.asarray(gen.lengths)[b]:
                break
            ids[b, lens[b]] = got[b, j]
            lens[b] += 1
            counts[b] += 1

    cur = jnp.asarray(ids)

    def fwd(mdl):
        emb = mdl.llm.embed(cur)
        sp = splice_visual_prefix(emb, cur, visual, jnp.asarray(lens))
        logits, hidden, _ = mdl.llm(sp.embeds, sp.positions, sp.attn_lens)
        return logits, hidden, sp.attn_lens

    _, hidden, attn_lens = model.apply(params, method=fwd)
    ref_hidden = np.asarray(hidden)

    pl = np.asarray(gen.prefill_len)
    gh = np.asarray(gen.hidden)
    checked = 0
    for b in range(B):
        for j in range(int(counts[b])):
            np.testing.assert_allclose(
                gh[b, j], ref_hidden[b, pl[b] + j], atol=5e-4, rtol=5e-4,
                err_msg=f"row {b} gen step {j}")
            checked += 1
    assert checked > 0


def test_pipeline_end_to_end(setup):
    model, params, batch = setup
    pipe = GroundedInference(model, params, max_new_tokens=MAX_NEW,
                             eos_id=EOS)
    res = pipe(batch["frames"][batch["video_idx"]],
               batch["context_images"][batch["video_idx"]],
               batch["frames_sam"][batch["video_idx"]],
               batch["input_ids"], batch["text_lens"])
    B = batch["input_ids"].shape[0]
    T_sam = batch["frames_sam"].shape[1]
    E4 = CFG.sam2.low_res_size * 4
    assert res.tokens.shape == (B, MAX_NEW)
    assert res.pred_masks.shape == (B, CFG.max_seg_tokens, T_sam, E4, E4)
    # slots without a generated [SEG] are forced to "no mask"
    sv = np.asarray(res.seg_valid)
    pm = np.asarray(res.pred_masks)
    for b in range(B):
        for s in range(CFG.max_seg_tokens):
            if not sv[b, s]:
                assert np.all(pm[b, s] <= -1e3)


@pytest.mark.slow
def test_pipeline_sharded_over_mesh(setup, mesh8):
    """Grounded inference with params sharded over the 4x2 (data, model)
    mesh — GSPMD propagates shardings through encode/prefill/decode/SAM
    (BASELINE: 'a full clip is grounded in one device program')."""
    from videoglamm_tpu.parallel import shard_params

    model, params, batch = setup
    with mesh8:
        sharded = {"params": shard_params(params["params"], mesh8)}
        pipe = GroundedInference(model, sharded, max_new_tokens=4, eos_id=EOS)
        res = pipe(batch["frames"][batch["video_idx"]],
                   batch["context_images"][batch["video_idx"]],
                   batch["frames_sam"][batch["video_idx"]],
                   batch["input_ids"], batch["text_lens"])
    assert np.isfinite(np.asarray(res.pred_masks)).any()
    assert res.tokens.shape[1] == 4

    # sharded and unsharded results agree
    pipe0 = GroundedInference(model, params, max_new_tokens=4, eos_id=EOS)
    res0 = pipe0(batch["frames"][batch["video_idx"]],
                 batch["context_images"][batch["video_idx"]],
                 batch["frames_sam"][batch["video_idx"]],
                 batch["input_ids"], batch["text_lens"])
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(res0.tokens))


def test_speculative_decode_matches_plain_greedy(setup):
    """n-gram speculative decoding must produce EXACTLY the plain greedy
    decode's tokens/lengths (verification discards any divergent draft) and
    matching hidden states on valid positions — for both a never-hit and a
    frequently-hit terminator, and for several draft depths."""
    from videoglamm_tpu.inference.generate import generate_speculative

    model, params, batch = setup
    visual = model.apply(
        params, batch["frames"], batch["context_images"],
        method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b))
    visual = visual[batch["video_idx"]]
    M = 12

    for eos in (EOS, 99999):
        ref = generate_with_prefix(
            model, params, visual, batch["input_ids"], batch["text_lens"],
            max_new_tokens=M, eos_id=eos)
        for K in (2, 4):
            got = generate_speculative(
                model, params, visual, batch["input_ids"],
                batch["text_lens"], max_new_tokens=M, eos_id=eos,
                draft_k=K)
            np.testing.assert_array_equal(np.asarray(got.tokens),
                                          np.asarray(ref.tokens))
            np.testing.assert_array_equal(np.asarray(got.lengths),
                                          np.asarray(ref.lengths))
            valid = (np.arange(M)[None, :, None]
                     < np.asarray(ref.lengths)[:, None, None])
            np.testing.assert_allclose(
                np.asarray(got.hidden) * valid,
                np.asarray(ref.hidden) * valid, atol=2e-4, rtol=2e-4)


def test_ngram_replay_stats():
    """Replay accept-rate measurement (honest speculative-decode numbers,
    VERDICT r2 weak #5): repetitive grounded-caption structure accepts
    most drafts, random text accepts none, and emitted-token accounting is
    exact."""
    from videoglamm_tpu.inference.generate import ngram_replay_stats

    # GCG-like stream: repeated "</p> [SEG] and <p>" scaffolding
    scaffold = [90, 91, 92, 93]
    phrases = [[10, 11, 12], [20, 21], [30, 31, 32, 33]]
    stream = []
    for ph in phrases * 3:
        stream.extend(ph + scaffold)
    stats = ngram_replay_stats(stream, draft_k=4)
    assert stats["tokens"] == len(stream) - 1
    assert stats["tokens_per_iteration"] > 1.5   # drafts pay off
    assert 0.0 < stats["accept_rate"] <= 1.0

    # non-repeating stream: nothing to match, 1 token per iteration
    rnd = list(range(100))
    stats = ngram_replay_stats(rnd, draft_k=4)
    assert stats["tokens_per_iteration"] == 1.0
    assert stats["accept_rate"] == 0.0

    # constant stream: the fallback drafter (repeat last) accepts all
    stats = ngram_replay_stats([7] * 40, draft_k=4)
    assert stats["tokens_per_iteration"] > 2.5


def test_video_branch_batched_matches_per_row(setup):
    """Batch>1 video-branch tracking (vmapped tracker) must reproduce the
    per-row tracker exactly — unlocks throughput serving on the memory-
    conditioned path (the reference protocol is batch-1 only)."""
    model, params, batch = setup
    pipe = GroundedInference(model, params, max_new_tokens=MAX_NEW,
                             eos_id=EOS)
    vidx = batch["video_idx"]
    frames_sam = batch["frames_sam"][vidx]
    B = batch["input_ids"].shape[0]
    assert B >= 2
    rng = np.random.RandomState(7)
    seg = jnp.asarray(rng.randn(B, CFG.max_seg_tokens,
                                CFG.out_dim), jnp.float32)

    batched = pipe._track_masks_batch(params, frames_sam, seg)
    rows = jnp.stack([pipe._track_masks(params, frames_sam[b], seg[b])
                      for b in range(B)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(rows),
                               atol=1e-5, rtol=1e-5)
