"""Browser/desktop demo loop: greedy vs greedy with randomized openings.

Counterpart of the reference's pygbag/WASM entry (/root/reference/main.py:36-55):
the same asyncio pump (``await asyncio.sleep(0)`` once per ply keeps the
Emscripten runtime responsive) drives the wrapped env, so
``python -m pygbag main.py`` builds the browser version (see
.github/workflows/pygbag.yml) and ``python main.py`` runs it on the desktop.
pygbag vendors dependencies from ``modules/`` (populated by install_wasm.sh).
"""

import argparse
import asyncio
import sys
import time

sys.path.append("modules")  # pygbag wheel drop (install_wasm.sh)

import numpy as np  # noqa: E402

from gobblet_rl_tpu import gobblet_v1  # noqa: E402
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy  # noqa: E402
from gobblet_rl_tpu.policies.random_policy import random_admissible_action  # noqa: E402


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--render_mode", type=str, default="human",
                        choices=["human", "rgb_array", "text", "text_full"])
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--depth", type=int, default=2, choices=[1, 2, 3])
    parser.add_argument("--games", type=int, default=3,
                        help="number of games (0 = loop forever, browser mode)")
    parser.add_argument("--move-delay", type=float, default=None,
                        help="seconds between moves (default: 0.25 on human)")
    return parser.parse_known_args()[0]


async def play_games(env, policies, games: int, move_delay: float) -> None:
    """The pygbag pump: one cooperative yield per ply."""
    played = 0
    while games == 0 or played < games:
        env.reset()
        env.render()
        ply = 0
        for agent in env.agent_iter():
            obs, reward, term, trunc, info = env.last()
            if term or trunc:
                env.step(None)
                continue
            if ply < 2:  # randomized opening for variety (main.py:36-50)
                action = random_admissible_action(obs["action_mask"])
            else:
                action = int(policies[agent].compute_action(
                    obs["observation"], obs["action_mask"]
                ))
            if move_delay:
                time.sleep(move_delay)
            env.step(action)
            await asyncio.sleep(0)  # keep it 0: yields to the browser loop
            ply += 1
        played += 1


async def main() -> None:
    args = parse_args()
    if args.seed is not None:
        np.random.seed(args.seed)
    env = gobblet_v1.env(render_mode=args.render_mode, args=args)
    policies = {
        a: GreedyGobbletPolicy(depth=args.depth)
        for a in ["player_1", "player_2"]
    }
    delay = args.move_delay
    if delay is None:
        delay = 0.25 if args.render_mode == "human" else 0.0
    await play_games(env, policies, args.games, delay)
    env.close()


if __name__ == "__main__":
    asyncio.run(main())
