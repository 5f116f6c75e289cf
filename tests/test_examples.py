"""Examples and periphery: CLI smoke runs (headless), GIF recorder, session
stats dict shape, logger output."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "SDL_VIDEODRIVER": "dummy",
    "SDL_AUDIODRIVER": "dummy",
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": REPO,
}


def run_example(args, timeout=240, extra_env=None):
    env = {**ENV, **(extra_env or {})}
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def test_example_basic_text():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_basic",
         "--render_mode", "text", "--seed", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TURN: 1" in r.stdout
    assert "Reward" in r.stdout


def test_example_greedy_watch_text():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_greedy",
         "--render_mode", "text", "--seed", "2", "--depth", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Final rewards" in r.stdout


def test_main_pygbag_entry_text():
    """The asyncio-pump browser/desktop entry plays a full greedy game."""
    r = run_example(
        ["main.py", "--render_mode", "text", "--seed", "9", "--games", "1",
         "--depth", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TURN" in r.stdout


def test_main_random_text():
    r = run_example(["main_random.py", "--render_mode", "text", "--seed", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TURN" in r.stdout


def test_example_dqn_watch_text():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_dqn",
         "--watch", "--render_mode", "text", "--opponent", "random",
         "--seed", "4"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Final rewards" in r.stdout


def test_example_alphazero_tiny():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_alphazero",
         "--iterations", "1", "--num-envs", "8", "--num-sims", "8",
         "--segment-len", "8", "--model", "mlp", "--eval-games", "0",
         "--seed", "5"], timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final:" in r.stdout


def test_example_alphazero_watch_text():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_alphazero",
         "--watch", "--render_mode", "text", "--opponent", "random",
         "--eval-sims", "12", "--model", "mlp", "--seed", "6"], timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Final rewards" in r.stdout


def test_gif_recorder(tmp_path):
    from gobblet_rl_tpu.render.gif import GIFRecorder

    out = str(tmp_path / "test.gif")
    rec = GIFRecorder(out_file=out)
    for i in range(5):
        rec.capture_frame(np.full((64, 64, 3), i * 40, np.uint8))
    rec.end_recording()
    assert os.path.exists(out)
    from PIL import Image

    img = Image.open(out)
    assert img.format == "GIF"
    img.seek(4)  # at least 5 frames


def test_session_stats_dict_shape():
    """collect_result returns the reference collector's dict shape
    (test_manual_policy_collector.py:484-495)."""
    from gobblet_rl_tpu import gobblet_v1
    from gobblet_rl_tpu.interactive.session import GameSession

    env = gobblet_v1.env(render_mode=None)
    session = GameSession(env)
    result = session.collect_result(np.array(18))
    expected_keys = {"n/ep", "n/st", "rews", "lens", "idxs", "rew", "len",
                     "rew_std", "len_std"}
    assert set(result) == expected_keys
    assert result["n/ep"] == 0 and result["n/st"] == 1
    assert result["rews"].dtype == np.float64 and len(result["rews"]) == 0


def test_metrics_logger(tmp_path):
    from gobblet_rl_tpu.train.logging import make_logger

    logger = make_logger(str(tmp_path / "log"), {"seed": 1})
    logger.log({"loss": 0.5, "win_rate": 0.9, "grad_steps": 10})
    logger.close()
    lines = open(tmp_path / "log" / "history.jsonl").read().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["loss"] == 0.5


def test_adapters_raise_cleanly_without_frameworks():
    try:
        import tianshou  # noqa: F401

        pytest.skip("tianshou installed; adapter import should succeed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="tianshou is not installed"):
        import gobblet_rl_tpu.adapters.tianshou_adapter  # noqa: F401


def test_example_tournament_cli():
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_tournament",
         "--agents", "random", "alphabeta-2", "--games", "8", "--json"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    standings = res["standings"]
    assert set(standings) == {"random", "alphabeta-2"}
    assert standings["alphabeta-2"]["elo"] > standings["random"]["elo"]


def test_example_tournament_zoo_search_entrant():
    """--zoo-search adds the '<name>+search2' learned-eval entrant."""
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_tournament",
         "--agents", "random", "--zoo-search", "dqn_greedy",
         "--games", "8", "--json"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    standings = res["standings"]
    assert set(standings) == {"random", "dqn_greedy+search2"}
    assert (standings["dqn_greedy+search2"]["elo"]
            > standings["random"]["elo"])


def test_bench_cli_json_contract():
    """bench.py's FINAL stdout line is the headline metric (the driver
    parses the tail); auxiliary metrics come before it."""
    r = run_example(
        ["bench.py"],
        timeout=480,
        extra_env={
            "GOBBLET_BENCH_BATCH": "512",
            "GOBBLET_BENCH_STEPS": "8",
            "GOBBLET_BENCH_REPEATS": "2",
            "GOBBLET_BENCH_TRAIN_ENVS": "64",
            "GOBBLET_BENCH_AZ_ENVS": "16",
            "GOBBLET_BENCH_AZ_SIMS": "4",
            "GOBBLET_BENCH_AZ_SEGMENT": "8",
            "GOBBLET_BENCH_PPO_ENVS": "64",
            "GOBBLET_BENCH_PPO_SEGMENT": "8",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(line) for line in r.stdout.strip().splitlines()]
    assert lines[-1]["metric"] == "env_steps_per_sec"
    assert set(lines[-1]) == {"metric", "value", "unit", "vs_baseline"}
    assert lines[-1]["value"] > 0
    for fam in ("dqn", "az", "ppo"):
        train = [
            rec for rec in lines
            if rec["metric"] == f"{fam}_train_env_steps_per_sec"
        ]
        assert len(train) == 1 and train[0]["iterations_per_sec"] > 0, fam
        # roofline accounting present whenever the backend exposes the XLA
        # cost model (CPU does; the axon remote backend may not)
        if "mfu" in train[0]:
            assert train[0]["mfu"] >= 0
            assert train[0]["xla_flops_per_iter"] > 0


def test_bench_scaling_cli():
    """Weak-scaling harness emits one JSON line per mesh size + summary."""
    r = run_example(
        ["bench_scaling.py"],
        timeout=240,
        extra_env={
            "GOBBLET_SCALING_MAX_DEVICES": "2",
            "GOBBLET_SCALING_BATCH": "512",
            "GOBBLET_SCALING_STEPS": "8",
            "GOBBLET_SCALING_REPEATS": "1",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(line) for line in r.stdout.strip().splitlines()]
    assert lines[-1]["metric"] == "weak_scaling_efficiency"
    per_size = [rec for rec in lines if rec["metric"] == "weak_scaling_env_steps_per_sec"]
    assert [rec["devices"] for rec in per_size] == [1, 2]
    assert all(rec["value"] > 0 for rec in per_size)


def test_example_user_input_cpu_only():
    """--cpu-players 2 plays autonomously (no pygame events needed); the
    --cpu-policy flag selects the engine-backed opponents."""
    r = run_example(
        ["-m", "gobblet_rl_tpu.examples.example_user_input",
         "--cpu-players", "2", "--cpu-policy", "random", "--seed", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
