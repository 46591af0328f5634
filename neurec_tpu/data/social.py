"""Social graph loading (parity: model/AbstractRecommender.py:55-73
SocialAbstractRecommender).

Reads a (user, friend) edge file, keeps edges whose endpoints exist in the
dataset's user id map, and returns a (num_users, num_users) CSR matrix of
remapped ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp


def load_social_matrix(dataset, config) -> sp.csr_matrix:
    social_users = pd.read_csv(
        config["social_file"],
        sep=config["data.convert.separator"],
        header=None,
        names=["user", "friend"],
    )
    users_key = np.array(list(dataset.userids.keys()))
    social_users = social_users[np.isin(social_users["user"], users_key)]
    social_users = social_users[np.isin(social_users["friend"], users_key)]
    user_id = [dataset.userids[u] for u in social_users["user"]]
    friend_id = [dataset.userids[u] for u in social_users["friend"]]
    num_users = dataset.num_users
    return sp.csr_matrix(
        (np.ones(len(user_id)), (user_id, friend_id)),
        shape=(num_users, num_users),
    )
