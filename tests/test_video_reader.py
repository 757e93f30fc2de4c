"""Native FFmpeg frame loader: build, decode correctness, sampling policy."""
import os

import numpy as np
import pytest

from videoglamm_tpu.data.video_reader import (VideoReader, load_frame_dir,
                                              load_video_frames,
                                              write_test_video)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vid") / "test.avi")
    write_test_video(p, w=64, h=48, n_frames=25, fps=5)
    return p


def test_open_and_metadata(video_path):
    vr = VideoReader(video_path)
    assert len(vr) == 25
    assert abs(vr.fps - 5.0) < 0.2
    assert vr.size == (64, 48)
    vr.close()


def test_decode_correct_frames(video_path):
    vr = VideoReader(video_path)
    idx = [0, 3, 10, 24]
    frames = vr.get_batch(idx)
    assert frames.shape == (4, 48, 64, 3)
    # each frame has base color (23f+40, 47f+80, 71f+120) — check via the
    # median (the white square perturbs a few pixels; codec is lossy)
    for f, want_f in zip(frames, idx):
        med = np.median(f.reshape(-1, 3), axis=0)
        want = np.array([(want_f * 23 + 40) & 0xFF, (want_f * 47 + 80) & 0xFF,
                         (want_f * 71 + 120) & 0xFF])
        assert np.abs(med - want).max() < 12, (want_f, med, want)
    vr.close()


def test_rewind_and_resize(video_path):
    vr = VideoReader(video_path)
    a = vr.get_batch([10])
    b = vr.get_batch([2], out_size=(32, 24))   # rewind + resize
    assert b.shape == (1, 24, 32, 3)
    med = np.median(b[0].reshape(-1, 3), axis=0)
    want = np.array([(2 * 23 + 40) & 0xFF, (2 * 47 + 80) & 0xFF,
                     (2 * 71 + 120) & 0xFF])
    assert np.abs(med - want).max() < 12
    vr.close()


def test_load_video_frames_policy(video_path):
    frames = load_video_frames(video_path, num_frames=8)
    assert len(frames) == 8
    assert frames[0].shape == (48, 64, 3)


def test_frame_dir_fallback(tmp_path):
    from PIL import Image
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(6):
        Image.fromarray(
            np.full((16, 16, 3), i * 30, np.uint8)).save(d / f"{i:05d}.jpg")
    frames = load_video_frames(str(d), num_frames=4)
    assert len(frames) == 4
    assert frames[0].mean() < 5 and frames[-1].mean() > 140
