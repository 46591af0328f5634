"""Host-side dataset preprocessing: filter, split, remap, md5.

Behavior parity with the reference's data/utils.py:

* ``filter_data``: drop NaNs, then items with < item_min interactions, then
  users with < user_min interactions — in that order (data/utils.py:25-36).
* ``split_by_ratio``: per-user, first ceil(ratio*n) rows to train; rows
  ordered by time when ``by_time`` else shuffled (data/utils.py:60-80).
* ``split_by_loo``: last row per user to test; users with <= 3 rows kept
  entirely in train (data/utils.py:83-105).
* ``check_md5``: md5 hex digest of the raw file (data/utils.py:10-17).

Implementation is vectorized pandas/numpy (no per-user Python loop) — the
reference loops over ``groupby`` groups, which is slow on large datasets.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd


def check_md5(file_name: str) -> str:
    if not os.path.isfile(file_name):
        raise FileNotFoundError("There is no file named '%s'!" % file_name)
    with open(file_name, "rb") as fin:
        return hashlib.md5(fin.read()).hexdigest()


def filter_data(
    data: pd.DataFrame,
    user_min: Optional[int] = None,
    item_min: Optional[int] = None,
) -> pd.DataFrame:
    data = data.dropna(how="any")
    if item_min is not None and item_min > 0:
        counts = data["item"].map(data["item"].value_counts())
        data = data[counts >= item_min]
    if user_min is not None and user_min > 0:
        counts = data["user"].map(data["user"].value_counts())
        data = data[counts >= user_min]
    return data


def _sorted_per_user(data: pd.DataFrame, by_time: bool, rng: np.random.RandomState):
    if by_time:
        data = data.sort_values(by=["user", "time"], kind="stable")
    else:
        # sort for per-user grouping, then shuffle within the user group
        data = data.sort_values(by=["user", "item"], kind="stable")
        perm = rng.permutation(len(data))
        data = data.iloc[perm].sort_values(by=["user"], kind="stable")
    return data


def split_by_ratio(
    data: pd.DataFrame,
    ratio: float = 0.8,
    by_time: bool = True,
    seed: int = 2018,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.RandomState(seed)
    data = _sorted_per_user(data, by_time, rng)
    grp = data.groupby("user", sort=False)
    sizes = grp.size().to_numpy()
    cut = np.ceil(ratio * sizes).astype(np.int64)
    rank = grp.cumcount().to_numpy()
    cut_per_row = np.repeat(cut, sizes)
    is_train = rank < cut_per_row
    train = data[is_train].reset_index(drop=True)
    test = data[~is_train].reset_index(drop=True)
    return train, test


def split_by_loo(
    data: pd.DataFrame,
    by_time: bool = True,
    seed: int = 2018,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.RandomState(seed)
    data = _sorted_per_user(data, by_time, rng)
    grp = data.groupby("user", sort=False)
    sizes = grp.size().to_numpy()
    rank = grp.cumcount().to_numpy()
    size_per_row = np.repeat(sizes, sizes)
    # users with <= 3 interactions keep everything in train
    is_test = (rank == size_per_row - 1) & (size_per_row > 3)
    train = data[~is_test].reset_index(drop=True)
    test = data[is_test].reset_index(drop=True)
    return train, test


def remap_ids(train: pd.DataFrame, test: pd.DataFrame):
    """Densely remap user/item ids by first appearance over train+test.

    Mirrors data/dataset.py:167-176. Returns (train, test, user2id, item2id).
    """
    all_data = pd.concat([train, test])
    unique_user = all_data["user"].unique()
    user2id = pd.Series(data=range(len(unique_user)), index=unique_user)
    unique_item = all_data["item"].unique()
    item2id = pd.Series(data=range(len(unique_item)), index=unique_item)

    train = train.copy()
    test = test.copy()
    train["user"] = train["user"].map(user2id)
    test["user"] = test["user"].map(user2id)
    train["item"] = train["item"].map(item2id)
    test["item"] = test["item"].map(item2id)
    return train, test, user2id.to_dict(), item2id.to_dict()
