"""Zoo-wide tensor parallelism: every model trains on the 2-D mesh with its
id-vocabulary tables actually row-sharded over the 'model' axis.

TP is opt-out (Recommender.param_shardings' default auto-shards any >=2-D
leaf whose leading dim is num_users/num_items/+1/stacked, when divisible by
the 'model' axis). This test drives all 35 registered models through
Trainer.initialize + one jitted epoch under a (4, 2) ('data','model') mesh
and asserts the placement really happened — catching both models whose
parameters fail to partition and models that silently replicate everything.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model, registered_models
from neurec_tpu.parallel.mesh import make_mesh
from neurec_tpu.trainer import Trainer
from tests.helpers import make_config, make_synthetic_dataset
from tests.test_graph_models import GRAPH_PROPS
from tests.test_itemset_models import PROPS as ITEMSET_PROPS
from tests.test_model_zoo import MODEL_PROPS
from tests.test_sequential_models import SEQ_PROPS
from tests.test_social_models import PROPS as SOCIAL_PROPS, _make_social_file


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


# models with no >=2-D vocab-keyed parameter leaf (nothing to row-shard)
NO_TABLE = {"Pop"}


@pytest.fixture(scope="module")
def shard_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("zoo_shard")
    # 60 users / 80 items: both divide the 'model' axis (2) evenly
    make_synthetic_dataset(tmp_path, num_users=60, num_items=80)
    social = _make_social_file(tmp_path, num_users=60)
    return tmp_path, str(social)


def _props_for(name, social):
    for props in (MODEL_PROPS, SEQ_PROPS, ITEMSET_PROPS, GRAPH_PROPS):
        if name in props:
            return dict(props[name])
    if name in SOCIAL_PROPS:
        return dict(SOCIAL_PROPS[name](social))
    raise KeyError(name)


def test_props_cover_whole_registry():
    covered = (
        set(MODEL_PROPS) | set(SEQ_PROPS) | set(ITEMSET_PROPS)
        | set(GRAPH_PROPS) | set(SOCIAL_PROPS)
    )
    assert covered == set(registered_models())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("name", sorted(
    set(MODEL_PROPS) | set(SEQ_PROPS) | set(ITEMSET_PROPS)
    | set(GRAPH_PROPS) | set(SOCIAL_PROPS)
))
def test_model_tables_shard_and_train_on_mesh(shard_setup, name):
    tmp_path, social = shard_setup
    props = _props_for(name, social)
    conf = make_config(tmp_path, recommender=name, alg_props=props)
    dataset = Dataset(conf)
    model = get_model(name)(dataset, conf)
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(model, dataset, conf, mesh=mesh, logger=SilentLogger())
    trainer.initialize()

    vocab = {
        model.num_users, model.num_items,
        model.num_users + 1, model.num_items + 1,
        model.num_users + model.num_items,
    }
    sharded_tables = []

    def check(leaf):
        if (
            hasattr(leaf, "sharding")
            and getattr(leaf, "ndim", 0) >= 2
            and leaf.shape[0] in vocab
            and leaf.shape[0] % 2 == 0
        ):
            assert leaf.sharding.spec[0] == "model", (
                "%s: vocab table %s not row-sharded (spec=%s)"
                % (name, leaf.shape, leaf.sharding.spec)
            )
            sharded_tables.append(leaf.shape)

    jax.tree.map(check, trainer.params)
    if name not in NO_TABLE:
        assert sharded_tables, "%s: no vocab table was row-sharded" % name

    if trainer._epoch_fn is not None:
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.PRNGKey(0),
            jnp.int32(1),
        )
        jax.block_until_ready(trainer.params)
        assert np.isfinite(float(loss)), "%s: non-finite loss on mesh" % name
