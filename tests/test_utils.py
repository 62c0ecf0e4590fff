"""Utility substrate (lisp_mcmc_tpu/utils.py vs reference C1,
mcmc-fitting.lisp:116-337)."""

import numpy as np
import pytest

from lisp_mcmc_tpu import utils


def test_range_list():
    assert utils.range_list(4) == [0, 1, 2, 3]
    assert utils.range_list(1, 2.0, 0.25) == [1, 1.25, 1.5, 1.75]
    assert utils.range_list(3, 3) == []


def test_thin_and_slice():
    seq = list(range(10))
    assert utils.thin(seq, 3) == [0, 3, 6, 9]
    assert utils.thin(seq, 1) == seq
    assert utils.slice_seq(seq, 2, 8, 2) == [2, 4, 6]


def test_mapcar_enum_and_map_tree():
    assert utils.mapcar_enum(lambda el, i: el * i, [5, 6, 7]) == [0, 6, 14]
    tree = [1, (2, [3, 4]), 5]
    assert utils.map_tree(lambda v: v + 1, tree) == [2, (3, [4, 5]), 6]
    assert utils.flatten(tree) == [1, 2, 3, 4, 5]


def test_plist_helpers():
    p = {"scale": 1.0, "x0": 2.0}
    assert utils.plist_keys(p) == ["scale", "x0"]
    assert utils.plist_values(p) == [1.0, 2.0]
    assert utils.make_plist(["a", "b"], [1, 2]) == {"a": 1, "b": 2}
    assert utils.array_to_plist(["a", "b"], np.array([3.0, 4.0])) == {"a": 3.0, "b": 4.0}
    with pytest.raises(ValueError):
        utils.array_to_plist(["a"], np.array([1.0, 2.0]))


def test_linspace_num_step_and_integer():
    np.testing.assert_allclose(utils.linspace(0, 1, num=5), [0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(utils.linspace(0, 1, step=0.25), [0, 0.25, 0.5, 0.75, 1.0])
    # integer output stays evenly spaced (the reference's :type 'integer
    # path rounds each point unevenly — SURVEY §2.2; deliberately fixed).
    ints = utils.linspace(0, 10, num=6, dtype=int)
    assert ints.dtype.kind == "i"
    np.testing.assert_array_equal(ints, [0, 2, 4, 6, 8, 10])
    with pytest.raises(ValueError):
        utils.linspace(0, 1, num=5, step=0.1)


def test_diff_helpers():
    np.testing.assert_allclose(
        utils.diff_matrix([[1.0, 2.0], [4.0, 6.0], [9.0, 12.0]]),
        [[3.0, 4.0], [5.0, 6.0]],
    )
    assert utils.diff_params({"a": 5.0, "b": 1.0}, {"a": 2.0, "b": 4.0}) == {
        "a": 3.0,
        "b": -3.0,
    }


def test_partition_transpose_split_repeat():
    assert utils.partition([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
    assert utils.transpose([[1, 2, 3], [4, 5, 6]]) == [[1, 4], [2, 5], [3, 6]]
    assert utils.split_string("a;;b;c", ";") == ["a", "b", "c"]
    assert utils.repeat("x", 3) == ["x", "x", "x"]
    with pytest.raises(ValueError):
        utils.partition([1], 0)
