"""Tutorial: train a tiny AlphaZero agent and watch it play.

Beyond-reference capability walkthrough (the reference tops out at the
depth-3 greedy scan): one fused self-play/learn iteration on a small MLP
with the Gumbel search (good targets at very low simulation counts — see
docs/RESULTS.md), then a rendered game of the trained net vs the greedy
baseline.  Sized to finish in about a minute on CPU; scale num_envs /
num_sims / iterations up on a real chip.
"""

import jax
import numpy as np

from gobblet_rl_tpu import gobblet_v1
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy
from gobblet_rl_tpu.search import GumbelConfig, gumbel_search
from gobblet_rl_tpu.train import alphazero as az


def train_tiny():
    config = az.AZConfig(
        num_envs=16, num_sims=12, segment_len=16, search="gumbel",
        max_considered=8, batch_size=64, updates_per_iter=2,
        iterations=3, model="mlp", hidden_sizes=(64, 64),
    )
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    it = az.make_train_iteration(config, net, optimizer)
    key = jax.random.PRNGKey(1)
    for i in range(config.iterations):
        key, sub = jax.random.split(key)
        params, opt_state, env_state, stats = it(
            st.params, st.opt_state, st.env_state, sub
        )
        st = az.AZState(params, opt_state, env_state)
        print(
            f"iteration {i}: loss {float(stats['loss']):.3f} "
            f"(policy {float(stats['policy_loss']):.3f}, "
            f"value {float(stats['value_loss']):.3f}), "
            f"episodes {int(stats['episodes'])}"
        )
    return config, net, st


def watch(config, net, st, seed=0):
    """One rendered game: the searched net (player 1) vs greedy depth-1."""
    env = gobblet_v1.env(render_mode="text")
    env.reset(seed=seed)
    np.random.seed(seed)
    greedy = GreedyGobbletPolicy(depth=1)
    gcfg = GumbelConfig(num_sims=config.num_sims,
                        max_considered=config.max_considered)
    key = jax.random.PRNGKey(seed)

    for agent in env.agent_iter():
        obs, reward, term, trunc, info = env.last()
        if term or trunc:
            print(f"agent {agent} reward {reward}")
            env.step(None)
            continue
        if agent == "player_1":
            board = np.asarray(env.unwrapped.board._grid())[None]
            key, sub = jax.random.split(key)
            actions, _, _, _, _ = gumbel_search(
                lambda p, o: net.apply(p, o), st.params,
                board, np.zeros(1, np.int32), sub, gcfg,
            )
            action = int(actions[0])
        else:
            action = int(greedy.compute_action(obs["observation"],
                                               obs["action_mask"]))
        env.step(action)


if __name__ == "__main__":
    config, net, st = train_tiny()
    watch(config, net, st)
