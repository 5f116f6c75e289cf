"""Model zoo: the make_zoo pipeline, the committed entries, and the
tournament CLI integration."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_zoo_quick_pipeline(tmp_path):
    """scripts/make_zoo.py --quick trains, measures and saves an entry into
    GOBBLET_ZOO_DIR; the saved blob round-trips through zoo.load/policy."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "GOBBLET_ZOO_DIR": str(tmp_path),
    }
    r = subprocess.run(
        [sys.executable, "scripts/make_zoo.py", "--quick", "--eval-games", "8",
         "--entries", "ppo_league"],
        cwd=REPO, env=env, timeout=600, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["ppo_league"]["family"] == "ppo"
    assert "vs_random" in manifest["ppo_league"]["metrics"]
    assert (tmp_path / "ppo_league.msgpack").stat().st_size > 1000

    os.environ["GOBBLET_ZOO_DIR"] = str(tmp_path)
    try:
        import jax

        from gobblet_rl_tpu import zoo
        from gobblet_rl_tpu.ops import batched_core as bc

        assert zoo.names() == ["ppo_league"]
        pol = zoo.policy("ppo_league")
        state = bc.reset_planes(4)
        actions = pol(jax.random.PRNGKey(0), state.board, state.current)
        mask = np.asarray(bc.legal_mask_planes(state.board, state.current))
        assert all(mask[a, i] for i, a in enumerate(np.asarray(actions)))
    finally:
        del os.environ["GOBBLET_ZOO_DIR"]


def _committed_names():
    from gobblet_rl_tpu import zoo

    return zoo.names()


@pytest.mark.parametrize("name", ["alphazero_gumbel32", "dqn_greedy",
                                  "ppo_league"])
def test_committed_entry_plays_legal_moves(name):
    """Every committed zoo entry loads and emits mask-legal actions from a
    batch of fresh boards (and its host_agent works on the AEC obs layout)."""
    if name not in _committed_names():
        pytest.skip(f"{name} not committed yet")
    import jax

    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.ops import batched_core as bc

    kw = {"num_sims": 8} if name.startswith("alphazero") else {}
    pol = zoo.policy(name, **kw)
    state = bc.reset_planes(4)
    actions = pol(jax.random.PRNGKey(1), state.board, state.current)
    mask = np.asarray(bc.legal_mask_planes(state.board, state.current))
    assert all(mask[a, i] for i, a in enumerate(np.asarray(actions)))

    agent = zoo.host_agent(name, **kw)
    from gobblet_rl_tpu import gobblet_v1

    env = gobblet_v1.env()
    env.reset(seed=3)
    obs, *_ = env.last()
    a = agent.compute_action(obs["observation"], obs["action_mask"])
    assert obs["action_mask"][a] == 1


def test_committed_metrics_beat_random():
    """The manifest's measured strength must clear sanity floors (these are
    the numbers advertised in docs/RESULTS.md)."""
    from gobblet_rl_tpu import zoo

    if not zoo.names():
        pytest.skip("zoo empty")
    for name in zoo.names():
        metrics = zoo.meta(name)["metrics"]
        assert metrics["vs_random"] >= 0.8, (name, metrics)


def test_example_dqn_watch_zoo():
    """--watch --zoo renders a full game with the committed DQN params."""
    if "dqn_greedy" not in _committed_names():
        pytest.skip("dqn_greedy not committed yet")
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "SDL_VIDEODRIVER": "dummy",
        "SDL_AUDIODRIVER": "dummy",
    }
    r = subprocess.run(
        [sys.executable, "-m", "gobblet_rl_tpu.examples.example_dqn",
         "--watch", "--zoo", "dqn_greedy", "--render_mode", "text",
         "--opponent", "random"],
        cwd=REPO, env=env, timeout=600, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Final rewards" in r.stdout


def test_tournament_cli_zoo_entry():
    if "dqn_greedy" not in _committed_names():
        pytest.skip("dqn_greedy not committed yet")
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
    }
    r = subprocess.run(
        [sys.executable, "-m", "gobblet_rl_tpu.examples.example_tournament",
         "--agents", "random", "--zoo", "dqn_greedy", "--games", "8",
         "--json"],
        cwd=REPO, env=env, timeout=600, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(res["standings"]) == {"random", "dqn_greedy"}


@pytest.mark.slow
def test_alphazero_converts_won_opening_vs_oracle():
    """Ground-truth strength: the opening is a PROVEN first-player win in 13
    plies (tests/test_native.py); the committed AlphaZero agent must convert
    it against the exact solver's best defense (measured 32/32 in round 3,
    scripts/exploitability.py)."""
    if "alphazero_gumbel32" not in _committed_names():
        pytest.skip("alphazero_gumbel32 not committed yet")
    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.eval import tournament

    res = tournament.play_match(
        zoo.policy("alphazero_gumbel32"),
        tournament.solver_policy(depth=15),
        num_games=16, seed=0, swap_colors=False, max_plies=60,
    )
    assert res["losses"] == 0, res
    assert res["win_rate"] >= 0.9, res


@pytest.mark.slow
def test_ppo_league_oracle_perfect_play():
    """The round-5 ppo_league entry matches the native expert on BOTH
    oracle metrics (docs/RESULTS.md): it converts won openings against the
    solver's best defense with a PLAIN argmax policy (no search at eval
    time), and defends to the theoretical 13 plies with zero provable
    mistakes."""
    if "ppo_league" not in _committed_names():
        pytest.skip("ppo_league not committed yet")
    from gobblet_rl_tpu import zoo
    from gobblet_rl_tpu.eval import tournament

    pol = zoo.policy("ppo_league")
    res = tournament.play_match(
        pol, tournament.solver_policy(depth=15),
        num_games=16, seed=0, swap_colors=False, max_plies=60,
    )
    assert res["losses"] == 0 and res["win_rate"] >= 0.9, res
    d = tournament.defense_audit(pol, num_games=8, seed=1, depth=16)
    assert d["mean_plies_survived"] >= 12.5, d
    assert d["mistakes_per_game"] <= 0.25, d


@pytest.mark.slow
def test_az_value_search_converts_without_mcts():
    """policies/value_search.py over the committed AZ value head — depth-2
    minimax + exact leaf solver, NO MCTS — also converts the won opening
    (round-5; the learned-eval upgrade of the reference's depth-3 scan)."""
    if "alphazero_gumbel32" not in _committed_names():
        pytest.skip("alphazero_gumbel32 not committed yet")
    from gobblet_rl_tpu.eval import tournament
    from gobblet_rl_tpu.policies import value_search

    res = tournament.play_match(
        value_search.zoo_search_policy("alphazero_gumbel32"),
        tournament.solver_policy(depth=15),
        num_games=8, seed=0, swap_colors=False, max_plies=60,
    )
    assert res["losses"] == 0 and res["win_rate"] >= 0.85, res
