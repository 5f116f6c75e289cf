"""Tournament tool: match mechanics, strength ordering, determinism."""

import jax
import pytest
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


def test_defense_audit_mistake_logic_with_stub_solver():
    """Unit test of the defense-audit grading (no native solver): a stub
    whose distances make every agent move a provable mistake flags every
    game at the agent's first move (absolute ply 2), and a stub that always
    reports optimal decay (d-1) yields a fully clean audit."""
    from gobblet_rl_tpu.eval import tournament

    agent = tournament.random_policy()
    fake_oracle = tournament.random_policy()

    def always_mistake(board27, player):
        return True, (9 if player == 1 else 3)  # d_after 3 < d_before 9 - 1

    res = tournament.defense_audit(
        agent, num_games=4, seed=0, max_plies=8,
        solve_fn=always_mistake, oracle_policy=fake_oracle,
    )
    assert res["clean_game_frac"] == 0.0
    assert res["mean_first_mistake_ply"] == 2.0
    assert res["mistakes_per_game"] >= 1.0

    def always_optimal(board27, player):
        return True, (9 if player == 1 else 8)  # exactly d_before - 1

    res2 = tournament.defense_audit(
        agent, num_games=4, seed=0, max_plies=8,
        solve_fn=always_optimal, oracle_policy=fake_oracle,
    )
    assert res2["clean_game_frac"] == 1.0
    assert res2["mean_first_mistake_ply"] is None
    assert res2["mistakes_per_game"] == 0.0


@pytest.mark.slow
def test_defense_audit_discriminates_with_real_solver():
    """With the real oracle: the solver defending against itself survives
    the full theoretical 13 plies with zero provable mistakes, while a
    random defender both dies sooner on average and commits provable
    mistakes — the gradient the plain forced-loss rate cannot show."""
    from gobblet_rl_tpu.eval import tournament
    from gobblet_rl_tpu.native import engine

    if not engine.available():
        pytest.skip("native engine unavailable")

    perfect = tournament.defense_audit(
        tournament.solver_policy(depth=16), num_games=4, seed=1, depth=16,
    )
    assert perfect["clean_game_frac"] == 1.0
    assert perfect["mean_plies_survived"] == 13.0

    rand = tournament.defense_audit(
        tournament.random_policy(), num_games=8, seed=1, depth=16,
    )
    assert rand["mean_plies_survived"] <= perfect["mean_plies_survived"]
    assert rand["mistakes_per_game"] > 0 or rand["mean_plies_survived"] < 13.0
    engine.solve_tt_clear()
