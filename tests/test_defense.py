"""Solver-supervised defense distillation (train/defense.py + the PPO
defense_bc_weight term)."""

import jax
import numpy as np
import pytest

from gobblet_rl_tpu.train import defense, ppo


@pytest.fixture(scope="module")
def bank():
    return defense.generate_defense_bank(num_games=24, seed=3, depth=14)


def test_bank_shapes_and_legality(bank):
    n = bank["obs"].shape[0]
    assert n > 0
    assert bank["obs"].shape == (n, 117)
    assert bank["mask"].shape == (n, 54)
    assert bank["board"].shape == (n, 27)
    legal = bank["mask"][np.arange(n), bank["action"]]
    assert legal.all()
    # deduplicated
    assert len({b.tobytes() for b in bank["board"]}) == n


def test_bank_labels_are_mate_maximizing(bank):
    """The label move must be PROVABLY optimal defense: from a position
    lost in d plies, it reaches a position lost in exactly d-1 (the
    defense_audit grading rule)."""
    from gobblet_rl_tpu.core import rules_np
    from gobblet_rl_tpu.native import engine

    engine.load()
    checked = 0
    for board, action in list(zip(bank["board"], bank["action"]))[:8]:
        res = engine.solve(board, player=1, max_depth=18)
        if not res["proven"] or res["mate_in"] is None:
            continue
        d_before = res["mate_in"]
        nb = rules_np.apply_action(board.reshape(3, 9), 1, int(action))
        if rules_np.line_winner(nb) != 0:
            # mover lost on the spot — only optimal if d_before was 0-ish
            assert d_before <= 1
            continue
        res2 = engine.solve(nb.reshape(27), player=0, max_depth=18)
        assert res2["proven"] and res2["mate_in"] == d_before - 1, (
            d_before, res2,
        )
        checked += 1
    assert checked > 0


def test_bank_is_deterministic():
    a = defense.generate_defense_bank(num_games=8, seed=5, depth=12)
    b = defense.generate_defense_bank(num_games=8, seed=5, depth=12)
    np.testing.assert_array_equal(a["board"], b["board"])
    np.testing.assert_array_equal(a["action"], b["action"])


def test_ppo_defense_bc_trains_toward_labels():
    """A few BC-weighted iterations must increase the policy's agreement
    with the solver's defensive moves (measured on the SAME bank the run
    trains on — generate_defense_bank is deterministic in the seed)."""
    import jax.numpy as jnp

    config = ppo.PPOConfig(
        shared_policy=True, learner_player="both", opponent="random",
        defense_bc_weight=5.0, defense_bank_games=8, defense_bank_depth=12,
        num_envs=32, segment_len=8, minibatches=2, epochs_per_iter=2,
        iterations=12, hidden_sizes=(32, 32),
    )
    train_bank = defense.generate_defense_bank(
        num_games=config.defense_bank_games, seed=config.seed,
        depth=config.defense_bank_depth,
    )

    def agreement(params, net):
        logits, _ = net.apply(params, jnp.asarray(train_bank["obs"]))
        ml = jnp.where(jnp.asarray(train_bank["mask"]), logits, -1e9)
        pred = np.asarray(jnp.argmax(ml, axis=-1))
        return (pred == train_bank["action"]).mean()

    net = ppo.make_net(config)
    _, _, st0 = ppo.init_ppo(config, jax.random.PRNGKey(config.seed))
    before = agreement(st0.params[0], net)
    st, hist = ppo.train(config)
    after = agreement(st.params[0], net)
    # 48 grad-norm-clipped updates: a clear rise, not full memorization
    # (the shipped recipe runs ~250x more updates)
    assert after > before and after >= 0.2, (before, after)
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_dqn_defense_bc_trains_toward_labels():
    """Same mechanism on the DQN family: the CE-over-masked-Q term pushes
    the argmax policy toward the solver's defensive moves."""
    import jax.numpy as jnp

    from gobblet_rl_tpu.train import dqn

    config = dqn.DQNConfig(
        opponent="random", defense_bc_weight=5.0, defense_bank_games=8,
        defense_bank_depth=12, lr=1e-3, buffer_size=2048, epoch=6,
        step_per_epoch=6, segment_len=4, update_per_collect=4,
        batch_size=64, num_envs=32, hidden_sizes=(32, 32),
    )
    train_bank = defense.generate_defense_bank(
        num_games=config.defense_bank_games, seed=config.seed,
        depth=config.defense_bank_depth,
    )
    net = dqn.make_net(config)

    def agreement(params):
        q = net.apply(params, jnp.asarray(train_bank["obs"]))
        ml = jnp.where(jnp.asarray(train_bank["mask"]), q, -1e9)
        pred = np.asarray(jnp.argmax(ml, axis=-1))
        return (pred == train_bank["action"]).mean()

    import optax

    ts0 = dqn.init_train_state(config, net, optax.adam(config.lr),
                               jax.random.PRNGKey(config.seed))
    before = agreement(ts0.params)
    ts, hist = dqn.train(config)
    after = agreement(ts.params)
    assert after > before and after >= 0.2, (before, after)
    assert all(np.isfinite(h["loss"]) for h in hist)
