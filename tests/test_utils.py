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


def test_variance_scaling_inits_use_tf_fan_for_1d():
    """TF's variance_scaling on a rank-1 shape uses fan = shape[-1]; the
    old (1, n) promotion gave fan=1 (std sqrt(2) for he_normal at every
    size — review r5)."""
    import jax

    from neurec_tpu.ops.initializers import get_initializer

    n = 20000
    for method, want_std in (("he_normal", (2.0 / n) ** 0.5),
                             ("he_uniform", (2.0 / n) ** 0.5),
                             ("xavier_normal", (1.0 / n) ** 0.5),
                             ("xavier_uniform", (1.0 / n) ** 0.5)):
        v = np.asarray(get_initializer(method)(jax.random.PRNGKey(0), (n,)))
        assert abs(float(v.std()) - want_std) < 0.15 * want_std, (
            method, float(v.std()), want_std)
        # 2-D shapes keep the jax base initializer (unchanged)
        w = np.asarray(
            get_initializer(method)(jax.random.PRNGKey(0), (n // 100, 100))
        )
        assert np.isfinite(w).all()


def test_data_iterator_does_not_box_arrays():
    import numpy as np_

    from neurec_tpu.data.iterator import DataIterator

    arr = np_.arange(1000, dtype=np_.int32)
    it = DataIterator(arr, batch_size=100)
    assert it._data[0] is arr  # kept as-is, no eager list() boxing
    first = next(iter(it))
    assert list(first) == list(range(100))


def test_try_load_corrupt_pickle_falls_back(tmp_path):
    """A truncated pickle (EOFError — not an OSError/PickleError) must
    log 'unsuccessful' and return None, not crash model init (review
    r5; reference behavior NeuMF.py:118-121)."""
    from neurec_tpu.pretrain import try_load

    p = tmp_path / "trunc.pkl"
    p.write_bytes(b"\x80\x04")  # pickle protocol header, then EOF
    assert try_load(str(p)) is None


def test_data_iterator_pandas_series_positional():
    """A filtered pandas Series has a non-contiguous label index; batches
    must be positional (label-based lookup returned wrong rows after the
    no-boxing change — self-review r5)."""
    import pandas as pd

    from neurec_tpu.data.iterator import DataIterator

    df = pd.DataFrame({"user": [10, 20, 30, 40, 50]})
    filtered = df[df["user"] > 20]["user"]  # labels 2, 3, 4
    it = DataIterator(filtered, batch_size=2)
    got = [list(b) for b in it]
    assert got == [[30, 40], [50]]
