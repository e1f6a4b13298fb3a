import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vista_slam_tpu.native.bow import (Vocabulary, hamming, l1_score,
                                       train_vocabulary)
from vista_slam_tpu.slam.loop_detector import LoopDetector


def make_textured_image(seed, size=160):
    """Random blobs + gradients give ORB something to latch onto."""
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, (size // 8, size // 8))).astype(np.uint8)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (3, 3), 0)
    return img


@pytest.fixture(scope="module")
def corpus():
    orb = cv2.ORB_create()
    descs, img_ids, images = [], [], []
    for s in range(12):
        img = make_textured_image(s)
        images.append(img)
        _, d = orb.detectAndCompute(img, None)
        if d is not None:
            descs.append(d)
            img_ids.append(np.full(len(d), s))
    return (np.concatenate(descs), np.concatenate(img_ids), images)


@pytest.fixture(scope="module")
def vocab(corpus):
    descs, img_ids, _ = corpus
    return train_vocabulary(descs, k=6, levels=3, seed=0, image_ids=img_ids)


def test_hamming():
    a = np.zeros((1, 32), np.uint8)
    b = np.full((1, 32), 255, np.uint8)
    assert hamming(a, b)[0] == 256
    assert hamming(a, a)[0] == 0


def test_vocab_transform_and_score(vocab, corpus):
    descs, _, images = corpus
    orb = cv2.ORB_create()
    vecs = []
    for img in images:
        _, d = orb.detectAndCompute(img, None)
        vecs.append(vocab.transform(d))
    # self-similarity is 1 (L1-normalized identical vectors)
    assert abs(vocab.score(vecs[0], vecs[0]) - 1.0) < 1e-5
    # same image scores higher than a different image
    _, d0b = orb.detectAndCompute(images[0], None)
    v0b = vocab.transform(d0b)
    assert vocab.score(vecs[0], v0b) > vocab.score(vecs[0], vecs[5])
    # L1 normalization
    assert abs(float(vecs[0].vals.sum()) - 1.0) < 1e-5


def test_vocab_npz_roundtrip(vocab, corpus, tmp_path):
    descs = corpus[0][:50]
    p = str(tmp_path / "vocab.npz")
    vocab.save_npz(p)
    v2 = Vocabulary().load(p)
    a = vocab.transform(descs)
    b = v2.transform(descs)
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(a.vals, b.vals)


def test_dbow_text_format(tmp_path):
    """Parse a hand-written DBoW2-style text vocabulary."""
    lines = ["2 1 0 0"]
    # two leaf children of the root; 32-byte descriptors; weight
    d0 = " ".join(["0"] * 32)
    d1 = " ".join(["255"] * 32)
    lines.append(f"0 1 {d0} 0.7")
    lines.append(f"0 1 {d1} 0.3")
    p = str(tmp_path / "voc.txt")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    v = Vocabulary().load(p)
    assert v.num_words == 2
    descs = np.stack([np.zeros(32, np.uint8), np.full(32, 255, np.uint8),
                      np.full(32, 254, np.uint8)])
    words = v.descend(descs)
    assert words[0] == 0 and words[1] == 1 and words[2] == 1
    vec = v.transform(descs)
    np.testing.assert_allclose(vec.vals.sum(), 1.0, atol=1e-6)


def test_loop_detector_finds_revisit(vocab, corpus):
    """A sequence that revisits frame 0 at the end must propose it as a loop
    candidate despite the distance/NMS gating."""
    _, _, images = corpus
    det = LoopDetector(vocab, loop_dist_min=5, loop_nms=1,
                       loop_cand_thresh_neighbor=3)
    seq = [images[i % 10] for i in range(10)] + [images[0]]
    cands = None
    for i, img in enumerate(seq):
        cands = det.detect(img, farthest_neighbor=max(0, i - 2))
    assert cands, "revisit not detected"
    assert cands[0][0] == 0, cands


def test_l1_score_disjoint():
    from vista_slam_tpu.native.bow import BowVector

    a = BowVector(np.asarray([1, 2], np.int32), np.asarray([0.5, 0.5], np.float32))
    b = BowVector(np.asarray([3, 4], np.int32), np.asarray([0.5, 0.5], np.float32))
    assert l1_score(a, b) == 0.0
    assert abs(l1_score(a, a) - 1.0) < 1e-6


def test_loop_detector_skips_featureless_frames(vocab, corpus):
    """Frames with no ORB descriptors store a None BoW and are skipped in
    neighbor-threshold and candidate scoring without breaking detection
    (reference: loop_detector.py:16-18,31-32,42-43)."""
    _, _, images = corpus
    det = LoopDetector(vocab, loop_dist_min=5, loop_nms=1,
                       loop_cand_thresh_neighbor=3)
    blank = np.full_like(images[0], 127)  # uniform -> no ORB features
    seq = ([images[i % 10] for i in range(5)] + [blank]
           + [images[i % 10] for i in range(5, 10)] + [images[0]])
    cands = None
    for i, img in enumerate(seq):
        cands = det.detect(img, farthest_neighbor=max(0, i - 2))
    assert det.bow_feats[5] is None  # the blank frame stored None
    assert cands and cands[0][0] == 0  # revisit still found around it

    # a featureless QUERY returns no candidates but still registers
    n_before = len(det.bow_feats)
    assert det.detect(blank, farthest_neighbor=n_before - 2) == []
    assert len(det.bow_feats) == n_before + 1
