"""Data layer: conversation templating, tokenization, label masking,
preprocessing, fixed-shape collation."""
import numpy as np
import pytest

from videoglamm_tpu.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                      MASK_IGNORE_INDEX)
from videoglamm_tpu.data import (ConvGenerator, build_batch, conv_templates,
                                 preprocess_clip, preprocess_internvideo,
                                 preprocess_sam2, sample_frame_indices,
                                 tokenizer_image_token)


class FakeTokenizer:
    """Deterministic word-level tokenizer with a BOS token (id 1)."""
    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 2048

    def __init__(self):
        self.vocab = {}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = 10 + len(self.vocab)
        return self.vocab[w]

    def __call__(self, text):
        class R:
            pass
        r = R()
        r.input_ids = [self.bos_token_id] + [self._id(w)
                                             for w in text.split()]
        return r


def test_phi3_prompt_format():
    gen = ConvGenerator("phi3")
    prompts = gen.apply([
        {"from": "human", "value": "<video>\nWhat is the cat doing?"},
        {"from": "gpt", "value": "It sits. [SEG]"},
    ])
    p = prompts[0]
    # MPT style: system + sep, then role + msg + sep per turn
    assert p.startswith("<|system|>\nYou are a helpful AI assistant.<|end|>")
    assert "\n<|user|>\n<image>\nWhat is the cat doing?<|end|>" in p
    assert "\n<|assistant|>\nIt sits. [SEG]<|end|>" in p
    # <video> collapsed to ONE <image> placeholder
    assert p.count("<image>") == 1


def test_chat_prompt_open_turn():
    gen = ConvGenerator("phi3")
    p = gen.apply_for_chat("Segment the dog.", media="video")
    assert p.endswith("\n<|assistant|>\n")
    assert "<image>" in p


def test_tokenizer_image_token():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hello <image> world", tok)
    assert ids[0] == tok.bos_token_id
    assert IMAGE_TOKEN_INDEX in ids
    i = ids.index(IMAGE_TOKEN_INDEX)
    # bos appears exactly once
    assert ids.count(tok.bos_token_id) == 1
    assert len(ids) == 4  # bos, hello, <image>, world


def test_phi3_label_masking():
    gen = ConvGenerator("phi3")
    tok = FakeTokenizer()
    conv = gen.apply([
        {"from": "human", "value": "<video>\nDescribe."},
        {"from": "gpt", "value": "A cat [SEG] ."},
    ])[0]
    ids, labels, n = gen.tokenize_and_mask(conv, tok, max_len=128)
    assert n > 0
    valid = labels[:n] != IGNORE_INDEX
    # some positions supervised (the answer) and some masked (the prompt)
    assert valid.any()
    assert (~valid).any()
    # supervised ids must include the answer words but no system words
    sup = set(ids[:n][valid].tolist())
    assert tok.vocab["cat"] in sup
    assert tok.vocab["[SEG]"] in sup
    assert tok.vocab["helpful"] not in sup
    describe_ids = {v for k, v in tok.vocab.items() if "Describe" in k}
    assert not (describe_ids & sup)
    # the placeholder is never supervised
    assert IMAGE_TOKEN_INDEX not in ids[:n][valid]


def test_sample_frame_indices():
    assert sample_frame_indices(100, 16).shape == (16,)
    assert sample_frame_indices(100, 16)[0] == 0
    assert sample_frame_indices(100, 16)[-1] == 99
    # short video pads by repeating last frame
    idx = sample_frame_indices(3, 8)
    assert list(idx[:3]) == [0, 1, 2] and (idx[3:] == 2).all()


def test_preprocess_shapes_and_norm():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (240, 320, 3), np.uint8) for _ in range(2)]
    iv = preprocess_internvideo(frames)
    cl = preprocess_clip(frames)
    sm = preprocess_sam2(frames)
    assert iv.shape == (2, 224, 224, 3)
    assert cl.shape == (2, 336, 336, 3)
    assert sm.shape == (2, 1024, 1024, 3)
    # gray image maps near zero after ImageNet norm at pixel 124-ish
    gray = [np.full((64, 64, 3), 124, np.uint8)]
    sm1 = preprocess_sam2(gray)
    # exact SAM normalization per channel: (124 - mean_c) / std_c
    np.testing.assert_allclose(
        sm1[0, 0, 0],
        (124 - np.array([123.675, 116.28, 103.53]))
        / np.array([58.395, 57.12, 57.375]), rtol=1e-5)


def test_build_batch():
    rng = np.random.RandomState(0)
    T, Ts = 4, 2

    def sample(n_conv, n_seg):
        return dict(
            frames=rng.randn(T, 28, 28, 3),
            context_images=rng.randn(T, 56, 56, 3),
            frames_sam=rng.randn(Ts, 128, 128, 3),
            conversations=[(list(range(5 + i)), list(range(5 + i)))
                           for i in range(n_conv)],
            masks=rng.rand(n_seg, Ts, 32, 32).round(),
        )

    batch = build_batch([sample(2, 1), sample(1, 3)], max_text_len=16)
    assert batch["input_ids"].shape == (3, 16)
    assert list(batch["video_idx"]) == [0, 0, 1]
    assert batch["frames"].shape[0] == 2
    assert batch["gt_masks"].shape == (3, 4, Ts, 32, 32)
    # pad region is MASK_IGNORE_INDEX
    assert (batch["gt_masks"][0, 1:] == MASK_IGNORE_INDEX).all()
    assert (batch["gt_masks"][2, 3:] == MASK_IGNORE_INDEX).all()
    assert (batch["gt_masks"][2, :3] != MASK_IGNORE_INDEX).any()
    # labels padded with IGNORE_INDEX, lens correct
    assert batch["text_lens"][0] == 5
    assert (batch["labels"][0, 5:] == IGNORE_INDEX).all()


def test_prefetch_iterator():
    from videoglamm_tpu.data import PrefetchIterator
    import time

    def slow_gen():
        for i in range(5):
            time.sleep(0.01)
            yield i

    staged = []
    it = PrefetchIterator(slow_gen(), prefetch=2,
                          to_device=lambda x: staged.append(x) or x * 10)
    out = list(it)
    assert out == [0, 10, 20, 30, 40]
    assert staged == [0, 1, 2, 3, 4]

    # errors propagate to the consumer
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(bad_gen(), prefetch=1)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(it)
