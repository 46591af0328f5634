"""Host utilities: DataIterator, randint_choice, typeassert, argmax_top_k."""

import numpy as np
import pytest

from neurec_tpu.data.iterator import DataIterator
from neurec_tpu.utils import argmax_top_k, randint_choice, typeassert


def test_data_iterator_basic():
    it = DataIterator([1, 2, 3, 4, 5], ["a", "b", "c", "d", "e"], batch_size=2)
    batches = list(it)
    assert len(it) == 3
    assert batches[0] == ([1, 2], ["a", "b"])
    assert batches[2] == ([5], ["e"])


def test_data_iterator_drop_last_and_shuffle():
    it = DataIterator(list(range(10)), batch_size=3, drop_last=True, shuffle=True)
    batches = list(it)
    assert len(batches) == 3 == len(it)
    flat = [x for b in batches for x in b]
    assert len(set(flat)) == 9


def test_randint_choice_exclusion():
    np.random.seed(0)
    for _ in range(20):
        out = randint_choice(20, size=10, replace=True, exclusion=[0, 1, 2])
        assert not set(np.atleast_1d(out)) & {0, 1, 2}


def test_typeassert():
    @typeassert(x=int, y=(str, None))
    def f(x, y=None):
        return x

    assert f(3) == 3
    assert f(3, "hi") == 3
    with pytest.raises(TypeError):
        f("no")


def test_argmax_top_k():
    a = np.array([5.0, 1.0, 9.0, 9.0, 3.0])
    np.testing.assert_array_equal(argmax_top_k(a, 3), [2, 3, 0])
