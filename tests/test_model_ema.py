"""--use_ema ModelEma track: per-step fixed-decay EMA of the student,
saved as the checkpoint_best_ema family (reference util/utils.py:373-397
ModelEma + main.py:149-152,448-457). VERDICT round-1 item #7."""

import numpy as np
import jax
import jax.numpy as jnp

from datr_tpu.train.steps import train_step_burnin

from test_train_step import setup  # noqa: F401  (fixture reuse)


def _leaf0(tree):
    return jax.tree.leaves(tree)[0]


def test_model_ema_updates_only_when_enabled(setup):  # noqa: F811
    model, tx, state, batch, ccfg, wd = setup
    state = jax.tree.map(jnp.copy, state)
    b = {k: v for k, v in batch.items()
         if k not in ("images_strong", "real_sizes")}

    # disabled: model_ema untouched
    s1, _ = train_step_burnin(jax.tree.map(jnp.copy, state), b, model, tx,
                              ccfg, wd)
    for a, c in zip(jax.tree.leaves(s1.model_ema),
                    jax.tree.leaves(state.model_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # enabled: model_ema = decay*old + (1-decay)*new_params
    decay = 0.9
    s2, _ = train_step_burnin(jax.tree.map(jnp.copy, state), b, model, tx,
                              ccfg, wd, ema_decay=decay)
    expect = jax.tree.map(
        lambda old, new: decay * old + (1 - decay) * new,
        state.model_ema, s2.params,
    )
    moved = 0
    for got, exp, old in zip(jax.tree.leaves(s2.model_ema),
                             jax.tree.leaves(expect),
                             jax.tree.leaves(state.model_ema)):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(exp, np.float32),
            rtol=1e-5, atol=1e-7,
        )
        # leaves in frozen param groups (e.g. BN bias at lr 0) legitimately
        # stay put; count the ones that actually moved
        if not np.allclose(np.asarray(got), np.asarray(old)):
            moved += 1
    assert moved > 0, "no model_ema leaf moved with ema_decay enabled"
