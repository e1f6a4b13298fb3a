"""DBoW3 text-format parity: a vocabulary round-tripped through the exact
DBoW2/DBoW3 plain-text layout (`k L scoring weighting` header + `parent
is_leaf d0..d31 weight` node lines) must reproduce transforms, scores, and
loop-candidate ORDERING bit-for-bit — a break here silently changes loop
topology (SURVEY "Hard parts"; reference consumer:
vista_slam/loop_detector.py:6-33)."""

import numpy as np

from vista_slam_tpu.native.bow import (BowVector, Vocabulary, l1_score,
                                       train_vocabulary)


def _corpus(rng, n_img=12, per_img=40):
    descs = rng.integers(0, 256, (n_img * per_img, 32), np.uint8)
    image_ids = np.repeat(np.arange(n_img), per_img)
    return descs, image_ids


def test_text_roundtrip_transform_and_score(tmp_path):
    rng = np.random.default_rng(0)
    descs, image_ids = _corpus(rng)
    voc = train_vocabulary(descs, k=4, levels=3, image_ids=image_ids)
    p = str(tmp_path / "voc.txt")
    voc.save_dbow_text(p)

    voc2 = Vocabulary().load(p)
    assert voc2.k == voc.k and voc2.levels == voc.levels
    assert voc2.num_words == voc.num_words
    np.testing.assert_array_equal(voc2.node_word, voc.node_word)
    np.testing.assert_allclose(voc2.node_weight, voc.node_weight, rtol=1e-6)

    for seed in range(5):
        q = np.random.default_rng(seed).integers(0, 256, (30, 32), np.uint8)
        v1 = voc.transform(q)
        v2 = voc2.transform(q)
        np.testing.assert_array_equal(v1.ids, v2.ids)
        np.testing.assert_allclose(v1.vals, v2.vals, rtol=1e-6)

    a1 = voc.transform(descs[:40])
    b1 = voc.transform(descs[40:80])
    a2 = voc2.transform(descs[:40])
    b2 = voc2.transform(descs[40:80])
    assert abs(voc.score(a1, b1) - voc2.score(a2, b2)) < 1e-7


def test_loop_candidate_ordering_invariant(tmp_path):
    """Similarity RANKING against a query — what the loop detector consumes —
    must be identical before and after the text round trip."""
    rng = np.random.default_rng(1)
    descs, image_ids = _corpus(rng, n_img=20)
    voc = train_vocabulary(descs, k=5, levels=2, image_ids=image_ids)
    p = str(tmp_path / "voc.txt")
    voc.save_dbow_text(p)
    voc2 = Vocabulary().load(p)

    frames = [rng.integers(0, 256, (25, 32), np.uint8) for _ in range(15)]
    query = frames[0]
    db1 = [voc.transform(f) for f in frames]
    db2 = [voc2.transform(f) for f in frames]
    q1, q2 = voc.transform(query), voc2.transform(query)
    s1 = [voc.score(q1, v) for v in db1]
    s2 = [voc2.score(q2, v) for v in db2]
    np.testing.assert_allclose(s1, s2, atol=1e-7)
    assert np.argsort(s1).tolist() == np.argsort(s2).tolist()


def test_l1_score_matches_published_definition():
    """DBoW L1 score = 1 - 0.5*|v - w|_1 for L1-normalized vectors, computed
    sparsely as 0.5 * sum_{i in both} (|v_i| + |w_i| - |v_i - w_i|). Check
    against a hand-computed case and against the dense formula."""
    v = BowVector(np.array([1, 2], np.int32), np.array([0.5, 0.5], np.float32))
    w = BowVector(np.array([2, 3], np.int32),
                  np.array([0.25, 0.75], np.float32))
    # intersection = word 2: 0.5 * (0.5 + 0.25 - 0.25) = 0.25
    assert abs(l1_score(v, w) - 0.25) < 1e-7

    rng = np.random.default_rng(2)
    for _ in range(10):
        ids_v = np.sort(rng.choice(50, size=8, replace=False)).astype(np.int32)
        ids_w = np.sort(rng.choice(50, size=6, replace=False)).astype(np.int32)
        vals_v = rng.random(8).astype(np.float32)
        vals_v /= vals_v.sum()
        vals_w = rng.random(6).astype(np.float32)
        vals_w /= vals_w.sum()
        dense_v = np.zeros(50)
        dense_v[ids_v] = vals_v
        dense_w = np.zeros(50)
        dense_w[ids_w] = vals_w
        expected = 1.0 - 0.5 * np.abs(dense_v - dense_w).sum()
        got = l1_score(BowVector(ids_v, vals_v), BowVector(ids_w, vals_w))
        assert abs(got - expected) < 1e-6


def test_text_loader_tolerates_orbvoc_header_and_blank_lines(tmp_path):
    """Real ORBvoc.txt files carry a 4-field header and may end with a blank
    line; both must parse."""
    rng = np.random.default_rng(3)
    descs, image_ids = _corpus(rng, n_img=6)
    voc = train_vocabulary(descs, k=3, levels=2, image_ids=image_ids)
    p = str(tmp_path / "voc.txt")
    voc.save_dbow_text(p, scoring=0, weighting=0)
    with open(p, "a") as f:
        f.write("\n")
    voc2 = Vocabulary().load(p)
    assert voc2.num_words == voc.num_words
    q = rng.integers(0, 256, (10, 32), np.uint8)
    np.testing.assert_array_equal(voc.transform(q).ids, voc2.transform(q).ids)


def test_rejects_unsupported_vocabulary_types(tmp_path):
    """A DBoW file with non-L1/TF-IDF header types must fail loudly —
    loading it with our fixed semantics would silently change loop-candidate
    rankings."""
    import numpy as np
    import pytest

    from vista_slam_tpu.native.bow import Vocabulary

    p = str(tmp_path / "voc.txt")
    line = "0 1 " + " ".join(["3"] * 32) + " 0.25\n"
    with open(p, "w") as f:
        f.write("2 1 1 2\n" + line)  # scoring=1 (L2), weighting=2
    with pytest.raises(ValueError, match="unsupported DBoW"):
        Vocabulary().load(p)
    with open(p, "w") as f:
        f.write("2 1 0 0\n" + line)  # ORBvoc configuration loads fine
    v = Vocabulary().load(p)
    assert v.num_words == 1
