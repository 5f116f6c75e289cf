"""Tournament tool: match mechanics, strength ordering, determinism."""

import jax
import numpy as np

from gobblet_rl_tpu.env import vector
from gobblet_rl_tpu.eval import tournament


def test_match_accounting():
    m = tournament.play_match(
        tournament.random_policy(), tournament.random_policy(),
        num_games=128, seed=0,
    )
    assert m["wins"] + m["losses"] + m["undecided"] == 128
    assert m["undecided"] <= 10  # random games essentially always finish


def test_greedy_orders_by_depth():
    res = tournament.round_robin(
        {
            "random": tournament.random_policy(),
            "greedy1": tournament.greedy_policy(1),
            "greedy2": tournament.greedy_policy(2),
        },
        num_games=96,
        seed=1,
    )
    elo = {k: v["elo"] for k, v in res["standings"].items()}
    assert elo["greedy2"] > elo["greedy1"] > elo["random"], elo


def test_vector_env_determinism():
    """Same PRNG key => identical trajectories (SURVEY §7 multi-run
    determinism requirement)."""
    B, S = 64, 32
    outs = []
    for _ in range(2):
        state, ts = vector.vector_reset(B)
        state, ts, _, stats = vector.rollout(
            state, jax.random.PRNGKey(123), ts, vector.random_policy, S
        )
        outs.append((np.asarray(state.board), {k: int(v) for k, v in stats.items()}))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]


def test_tournament_cli_dqn_checkpoint(tmp_path):
    """--dqn-checkpoint restores a saved TrainState and enters it as 'dqn'."""
    import argparse

    import optax

    from gobblet_rl_tpu.examples import example_tournament
    from gobblet_rl_tpu.train import checkpoint as ckpt
    from gobblet_rl_tpu.train import dqn

    config = dqn.DQNConfig(hidden_sizes=(32, 32), dueling=True)
    net = dqn.make_net(config)
    ts = dqn.init_train_state(config, net, optax.adam(1e-4), jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path / "ckpt"), ts, step=0)

    args = example_tournament.get_parser().parse_args(
        ["--agents", "random", "--dqn-checkpoint", str(tmp_path / "ckpt"),
         "--dqn-hidden-sizes", "32", "32", "--games", "8", "--json"]
    )
    res = example_tournament.main(args)
    assert set(res["standings"]) == {"random", "dqn"}
    pair = res["pairs"]["random vs dqn"]
    assert pair["games"] == 8
