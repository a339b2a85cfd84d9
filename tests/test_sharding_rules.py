import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from tennis_tpu.models import CNNRNN
from tennis_tpu.parallel import create_train_state, make_mesh, sgd_with_schedule
from tennis_tpu.parallel.sharding_rules import param_shardings, state_shardings


def _specs(tree):
    return {
        jax.tree_util.keystr(p): s.spec
        for p, s in jax.tree_util.tree_leaves_with_path(
            tree, is_leaf=lambda x: hasattr(x, "spec")
        )
    }


def test_param_shardings_column_shards_wide_kernels():
    mesh = make_mesh(num_data=4, num_model=2)
    params = {
        "wide": {"kernel": jnp.zeros((128, 512)), "bias": jnp.zeros((512,))},
        "narrow": {"kernel": jnp.zeros((16, 32))},
        "odd": {"kernel": jnp.zeros((128, 257))},  # not divisible by 2
        "conv": {"kernel": jnp.zeros((3, 3, 8, 512))},  # 4D: replicated
    }
    sh = _specs(param_shardings(mesh, params, min_tp_dim=256))
    assert sh["['wide']['kernel']"] == P(None, "model")
    assert sh["['wide']['bias']"] == P()
    assert sh["['narrow']['kernel']"] == P()
    assert sh["['odd']['kernel']"] == P()
    assert sh["['conv']['kernel']"] == P()


def test_state_shardings_align_momentum_with_params():
    mesh = make_mesh(num_data=4, num_model=2)
    model = CNNRNN(model=None, num_classes=4, hidden_size=128, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.1)
    x = jnp.zeros((4, 3, 512))
    state = create_train_state(model, jax.random.PRNGKey(0), x, tx,
                               {"train": True})
    sh = state_shardings(mesh, state)

    p_specs = _specs(sh.params)
    tp = [k for k, s in p_specs.items() if s == P(None, "model")]
    assert tp, "expected at least one TP-sharded kernel"

    # momentum (trace) leaves with the same shapes get the same shardings
    o_specs = _specs(sh.opt_state)
    assert any(s == P(None, "model") for s in o_specs.values())

    # the sharded state actually device_puts and runs a step
    placed = jax.tree_util.tree_map(lambda v, s: jax.device_put(v, s), state, sh)
    y = jnp.zeros((8,), jnp.int32)
    xb = jnp.zeros((8, 3, 512))

    import optax

    @jax.jit
    def step(st, xb, y):
        def loss(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply({"params": p}, xb), y
            ).mean()

        l, g = jax.value_and_grad(loss)(st.params)
        return st.apply_gradients(g), l

    new_state, l = step(placed, xb, y)
    assert np.isfinite(float(l))
