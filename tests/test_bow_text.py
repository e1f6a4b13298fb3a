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


# ---------------------------------------------------------------------------
# Format-variant fuzzing (round-2 verdict weak #5): pin down EXACTLY which
# DBoW3 text artifacts load, reject everything outside the envelope loudly,
# and prove score invariance under the format's legal degrees of freedom.

def _voc_lines(voc, tmp_path, name="v.txt"):
    p = str(tmp_path / name)
    voc.save_dbow_text(p)
    with open(p) as f:
        header = f.readline()
        lines = f.read().splitlines()
    return p, header, lines


def test_all_header_type_combinations(tmp_path):
    """DBoW3 defines 6 scoring types and 2 weighting families (ids 0..5 /
    0..3); only (0, 0) = L1_NORM + TF_IDF — what the reference uses — may
    load. Every other combination must raise, not silently rescore."""
    import pytest

    line = "0 1 " + " ".join(["7"] * 32) + " 0.5\n"
    p = str(tmp_path / "voc.txt")
    for scoring in range(6):
        for weighting in range(4):
            with open(p, "w") as f:
                f.write(f"2 1 {scoring} {weighting}\n" + line)
            if (scoring, weighting) == (0, 0):
                assert Vocabulary().load(p).num_words == 1
            else:
                with pytest.raises(ValueError, match="unsupported DBoW"):
                    Vocabulary().load(p)


def test_score_invariant_under_node_relabeling(tmp_path):
    """Node ids are an artifact of line order; a consistent relabeling of
    the non-root nodes (lines permuted, parent fields rewritten) that keeps
    each parent's child order is the SAME vocabulary — descend tie-breaking
    follows child order (first minimal Hamming distance wins, as in DBoW3's
    sequential scan), so child order is the one semantically meaningful
    degree of freedom line order carries. Word ids change (they follow
    leaf-line order) but every transform/score — and so every
    loop-candidate ranking — must be bit-identical; in particular children
    need not be contiguous and may precede their parent."""
    rng = np.random.default_rng(11)
    descs, image_ids = _corpus(rng, n_img=8)
    voc = train_vocabulary(descs, k=3, levels=3, image_ids=image_ids)
    p, header, lines = _voc_lines(voc, tmp_path)
    voc_a = Vocabulary().load(p)

    n = len(lines) + 1
    parents_of = np.array([0] + [int(ln.split()[0]) for ln in lines])
    for seed in range(3):
        perm = np.concatenate(  # new_id[old_id]; root stays 0
            [[0], np.random.default_rng(seed).permutation(n - 1) + 1])
        # repair within-parent order: each parent's children (ascending old
        # ids = the loader's slot order) must stay ascending under perm
        for par in range(n):
            kids = np.flatnonzero(parents_of == par)
            kids = kids[kids > 0]
            if len(kids) > 1:
                perm[kids] = np.sort(perm[kids])
        new_lines = [None] * (n - 1)
        for old_id, ln in enumerate(lines, start=1):
            parts = ln.split()
            parts[0] = str(int(perm[int(parts[0])]))
            new_lines[int(perm[old_id]) - 1] = " ".join(parts)
        p2 = str(tmp_path / f"relabel{seed}.txt")
        with open(p2, "w") as f:
            f.write(header + "\n".join(new_lines) + "\n")
        voc_b = Vocabulary().load(p2)
        assert voc_b.num_words == voc_a.num_words
        frames = [rng.integers(0, 256, (20, 32), np.uint8) for _ in range(8)]
        va = [voc_a.transform(f) for f in frames]
        vb = [voc_b.transform(f) for f in frames]
        for i in range(len(frames)):
            for j in range(i):
                assert abs(voc_a.score(va[i], va[j])
                           - voc_b.score(vb[i], vb[j])) < 1e-7


def test_large_k_vocabulary_roundtrip(tmp_path):
    """A wide tree (k=16, the other extreme from ORBvoc's k=10) must round
    trip with bit-identical descend results."""
    rng = np.random.default_rng(12)
    descs, image_ids = _corpus(rng, n_img=10, per_img=80)
    voc = train_vocabulary(descs, k=16, levels=2, image_ids=image_ids)
    assert voc.num_words > 64
    p = str(tmp_path / "wide.txt")
    voc.save_dbow_text(p)
    voc2 = Vocabulary().load(p)
    q = rng.integers(0, 256, (200, 32), np.uint8)
    np.testing.assert_array_equal(voc.descend(q), voc2.descend(q))


def test_rejects_malformed_node_lines(tmp_path):
    """Out-of-envelope node lines must raise with a message, never silently
    clip/wrap: a wrapped descriptor byte or clipped parent id corrupts word
    assignment and thereby loop topology."""
    import pytest

    rng = np.random.default_rng(13)
    descs, image_ids = _corpus(rng, n_img=6)
    voc = train_vocabulary(descs, k=3, levels=2, image_ids=image_ids)
    _, header, lines = _voc_lines(voc, tmp_path)

    def write_mutated(name, mutate):
        ls = list(lines)
        mutate(ls)
        p = str(tmp_path / name)
        with open(p, "w") as f:
            f.write(header + "\n".join(ls) + "\n")
        return p

    def set_field(ls, line, field, value):
        parts = ls[line].split()
        parts[field] = value
        ls[line] = " ".join(parts)

    cases = {
        # parent id beyond the node count
        "parent_oob.txt": lambda ls: set_field(ls, 2, 0, str(len(ls) + 5)),
        "parent_neg.txt": lambda ls: set_field(ls, 2, 0, "-3"),
        "parent_frac.txt": lambda ls: set_field(ls, 2, 0, "1.5"),
        # descriptor byte outside uint8 (would wrap under .astype(np.uint8))
        "desc_256.txt": lambda ls: set_field(ls, 1, 5, "256"),
        "desc_neg.txt": lambda ls: set_field(ls, 1, 5, "-1"),
        "desc_frac.txt": lambda ls: set_field(ls, 1, 5, "3.7"),
        # non-finite weight
        "weight_nan.txt": lambda ls: set_field(ls, 0, 34, "nan"),
        "weight_inf.txt": lambda ls: set_field(ls, 0, 34, "inf"),
        # truncated final line
        "truncated.txt": lambda ls: ls.__setitem__(
            -1, " ".join(ls[-1].split()[:-4])),
    }
    for name, mutate in cases.items():
        with pytest.raises(ValueError, match="malformed DBoW"):
            Vocabulary().load(write_mutated(name, mutate))

    # an (k+1)-th child: every line reparented to node 1 overflows its slots
    def overfill(ls):
        for i in range(1, len(ls)):
            set_field(ls, i, 0, "1")
    with pytest.raises(ValueError, match="more than k"):
        Vocabulary().load(write_mutated("overfull.txt", overfill))
