"""Merkle commitment: build/prove/verify + tamper rejection."""

import numpy as np
import pytest

from zk_stark_project_tpu.ops import blake3 as b3
from zk_stark_project_tpu.ops import merkle


def _leaves(np_rng, n):
    data = np_rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    return b3.hash_words(data, 32)  # hash to decorrelate


def test_build_and_verify_paths(np_rng):
    leaves = _leaves(np_rng, 16)
    tree = merkle.MerkleTree(leaves)
    assert tree.depth == 4
    for idx in [0, 1, 7, 15]:
        path = tree.prove(idx)
        assert merkle.verify_path(np.asarray(leaves[idx]), idx, path, tree.root)


def test_prove_batch(np_rng):
    leaves = _leaves(np_rng, 32)
    tree = merkle.MerkleTree(leaves)
    idxs = [0, 5, 31, 17]
    paths = tree.prove_batch(idxs)
    for idx, path in zip(idxs, paths):
        assert merkle.verify_path(np.asarray(leaves[idx]), idx, path, tree.root)


def test_tampered_leaf_rejected(np_rng):
    leaves = _leaves(np_rng, 8)
    tree = merkle.MerkleTree(leaves)
    path = tree.prove(3)
    bad = np.asarray(leaves[3]).copy()
    bad[0] ^= 1
    assert not merkle.verify_path(bad, 3, path, tree.root)


def test_tampered_path_rejected(np_rng):
    leaves = _leaves(np_rng, 8)
    tree = merkle.MerkleTree(leaves)
    path = tree.prove(3)
    path[1] = path[1].copy()
    path[1][2] ^= 0x80
    assert not merkle.verify_path(np.asarray(leaves[3]), 3, path, tree.root)


def test_wrong_index_rejected(np_rng):
    leaves = _leaves(np_rng, 8)
    tree = merkle.MerkleTree(leaves)
    path = tree.prove(3)
    assert not merkle.verify_path(np.asarray(leaves[3]), 2, path, tree.root)


def test_single_leaf_tree(np_rng):
    leaves = _leaves(np_rng, 1)
    tree = merkle.MerkleTree(leaves)
    assert tree.depth == 0
    assert merkle.verify_path(np.asarray(leaves[0]), 0, [], tree.root)
