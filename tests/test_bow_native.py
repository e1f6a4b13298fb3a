"""C++ BoW kernels vs the numpy reference implementation."""

import numpy as np
import pytest

from vista_slam_tpu.native import bow as bow_mod
from vista_slam_tpu.native.bow import BowVector, l1_score, train_vocabulary

native = pytest.importorskip("vista_slam_tpu.native.bow_native")


def test_native_descend_matches_numpy():
    rng = np.random.default_rng(0)
    descs = rng.integers(0, 256, (400, 32)).astype(np.uint8)
    vocab = train_vocabulary(descs, k=5, levels=3, seed=1)
    d_test = rng.integers(0, 256, (77, 32)).astype(np.uint8)

    got = native.descend_native(vocab, d_test)

    # force the numpy path
    orig = bow_mod.descend_native
    bow_mod.descend_native = None
    try:
        want = vocab.descend(d_test)
    finally:
        bow_mod.descend_native = orig
    np.testing.assert_array_equal(got, want)


def test_native_l1_score_matches_numpy():
    rng = np.random.default_rng(1)
    for _ in range(10):
        na, nb = rng.integers(1, 30, 2)
        ids_a = np.sort(rng.choice(100, na, replace=False)).astype(np.int32)
        ids_b = np.sort(rng.choice(100, nb, replace=False)).astype(np.int32)
        va = rng.random(na).astype(np.float32)
        vb = rng.random(nb).astype(np.float32)
        va /= va.sum()
        vb /= vb.sum()
        a, b = BowVector(ids_a, va), BowVector(ids_b, vb)
        assert abs(native.l1_score_native(a, b) - l1_score(a, b)) < 1e-6
