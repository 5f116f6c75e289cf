// Native Gobblet rules engine + greedy search.
//
// Host-side runtime companion to the JAX compute path: powers the
// interactive play loop and single-env stepping where per-call JAX dispatch
// latency (~100us) would dominate, and serves as a third independent
// implementation for parity testing (see tests/test_native.py).
//
// Semantics mirror /root/reference/gobblet_rl/game/board.py (cited per
// function); the implementation is table-driven and branch-light rather than
// a translation of the reference's Python loops.
//
// Board encoding: int8[27], level-major (level = piece size - 1), cells 0-8
// column-major; piece ids +-1..6 (sign = player). Actions 0-53:
// action = pos + 9 * (piece - 1).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kCells = 9;
constexpr int kActions = 54;

// Win lines in the reference scan order (board.py:135-153); the LAST
// matching line decides (board.py:183-194).
constexpr int kLines[8][3] = {
    {0, 1, 2}, {3, 4, 5}, {6, 7, 8},
    {0, 3, 6}, {1, 4, 7}, {2, 5, 8},
    {0, 4, 8}, {2, 4, 6},
};

inline int action_pos(int a) { return a % 9; }
inline int action_piece(int a) { return a / 9 + 1; }
inline int piece_size(int p) { return (p + 1) / 2; }

// covered[i]: cell i's piece at level l is gobbled by a bigger one
// (board.py:203-220, color-blind).
inline void covered_mask(const int8_t* b, uint8_t cov[3][9]) {
  for (int i = 0; i < 9; ++i) {
    bool o0 = b[i] != 0, o1 = b[9 + i] != 0, o2 = b[18 + i] != 0;
    cov[0][i] = o0 && (o1 || o2);
    cov[1][i] = o1 && o2;
    cov[2][i] = 0;
  }
}

// flatboard: topmost signed piece per cell (board.py:159-177).
inline void flat_board(const int8_t* b, int8_t flat[9]) {
  for (int i = 0; i < 9; ++i) {
    int8_t v = b[18 + i];
    if (v == 0) v = b[9 + i];
    if (v == 0) v = b[i];
    flat[i] = v;
  }
}

// xorshift64* PRNG for native playouts/tiebreaks.
inline uint64_t next_rng(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *s = x;
  return x * 0x2545F4914F6CDD1DULL;
}

inline uint32_t rng_below(uint64_t* s, uint32_t n) {
  return static_cast<uint32_t>(next_rng(s) % n);
}

uint64_t legal_mask_impl(const int8_t* b, int player) {
  const int sign = player == 0 ? 1 : -1;
  uint8_t cov[3][9];
  covered_mask(b, cov);
  int8_t flat[9];
  flat_board(b, flat);

  // per-piece frozen flags (board.py:90-102)
  bool frozen[7] = {false};
  for (int p = 1; p <= 6; ++p) {
    const int lvl = piece_size(p) - 1;
    for (int i = 0; i < 9; ++i) {
      if (b[lvl * 9 + i] == sign * p) {
        frozen[p] = cov[lvl][i];
        break;
      }
    }
  }

  uint64_t mask = 0;
  for (int a = 0; a < kActions; ++a) {
    const int p = action_piece(a);
    if (frozen[p]) continue;
    const int pos = action_pos(a);
    const int8_t top = flat[pos];
    // empty target, or strictly larger piece (board.py:106-115)
    if (top == 0 || piece_size(p) > piece_size(top < 0 ? -top : top)) {
      mask |= 1ULL << a;
    }
  }
  return mask;
}

void apply_impl(int8_t* b, int player, int action) {
  const int sign = player == 0 ? 1 : -1;
  const int p = action_piece(action);
  const int8_t signed_p = static_cast<int8_t>(sign * p);
  const int lvl = piece_size(p) - 1;
  // lift from previous location (board.py:127-131)
  for (int i = 0; i < 27; ++i) {
    if (b[i] == signed_p) {
      b[i] = 0;
      break;
    }
  }
  b[lvl * 9 + action_pos(action)] = signed_p;
}

int winner_impl(const int8_t* b) {
  int8_t flat[9];
  flat_board(b, flat);
  int w = 0;
  for (const auto& line : kLines) {
    const int8_t a = flat[line[0]], c = flat[line[1]], d = flat[line[2]];
    if (a > 0 && c > 0 && d > 0) w = 1;
    if (a < 0 && c < 0 && d < 0) w = -1;
  }
  return w;
}

// Pick uniformly among the set bits of mask.
int random_from_mask(uint64_t mask, uint64_t* rng) {
  const int n = __builtin_popcountll(mask);
  if (n == 0) return -1;
  int k = static_cast<int>(rng_below(rng, n));
  while (k--) mask &= mask - 1;  // drop k lowest set bits
  return __builtin_ctzll(mask);
}

}  // namespace

extern "C" {

void gob_reset(int8_t* board) { std::memset(board, 0, 27); }

uint64_t gob_legal_mask(const int8_t* board, int player) {
  return legal_mask_impl(board, player);
}

int gob_is_legal(const int8_t* board, int player, int action) {
  if (action < 0 || action >= kActions) return 0;
  return (legal_mask_impl(board, player) >> action) & 1;
}

// Silent no-op when illegal (board.py:124-126).
void gob_apply(int8_t* board, int player, int action) {
  if (!gob_is_legal(board, player, action)) return;
  apply_impl(board, player, action);
}

int gob_winner(const int8_t* board) { return winner_impl(board); }

// Depth-1/2 greedy (priority-exact like policies/greedy_jax.py):
// immediate win (lowest action) > safe move (opponent has no winning reply;
// random tiebreak) > not-immediately-losing (random) > any legal (random).
int gob_greedy_action(const int8_t* board, int player, int depth,
                      uint64_t* rng_state) {
  const int my_sign = player == 0 ? 1 : -1;
  const uint64_t mask = legal_mask_impl(board, player);
  if (mask == 0) return -1;

  uint64_t not_losing = 0, safe = 0;
  for (int a = 0; a < kActions; ++a) {
    if (!((mask >> a) & 1)) continue;
    int8_t b1[27];
    std::memcpy(b1, board, 27);
    apply_impl(b1, player, a);
    const int w1 = winner_impl(b1);
    if (w1 == my_sign) return a;  // ascending scan + break, like the reference
    if (w1 == -my_sign) continue; // uncovers an opponent line
    not_losing |= 1ULL << a;
    if (depth >= 2) {
      const uint64_t reply_mask = legal_mask_impl(b1, 1 - player);
      bool opp_wins = false;
      for (int r = 0; r < kActions && !opp_wins; ++r) {
        if (!((reply_mask >> r) & 1)) continue;
        int8_t b2[27];
        std::memcpy(b2, b1, 27);
        apply_impl(b2, 1 - player, r);
        if (winner_impl(b2) == -my_sign) opp_wins = true;
      }
      if (!opp_wins) safe |= 1ULL << a;
    }
  }
  if (depth >= 2 && safe) return random_from_mask(safe, rng_state);
  if (not_losing) return random_from_mask(not_losing, rng_state);
  return random_from_mask(mask, rng_state);
}

// Random-admissible playout driver; returns completed episodes.
// winners (optional, size >= num_steps) records per-step winner (0 none).
long gob_random_playout(int8_t* board, int* player, long num_steps,
                        uint64_t seed, int8_t* winners) {
  uint64_t rng = seed | 1;
  long episodes = 0;
  for (long s = 0; s < num_steps; ++s) {
    const uint64_t mask = legal_mask_impl(board, *player);
    const int a = random_from_mask(mask, &rng);
    apply_impl(board, *player, a);
    const int w = winner_impl(board);
    if (winners) winners[s] = static_cast<int8_t>(w);
    if (w != 0) {
      ++episodes;
      std::memset(board, 0, 27);
      *player = 0;
    } else {
      *player = 1 - *player;
    }
  }
  return episodes;
}

// Greedy-vs-greedy / greedy-vs-random match driver for eval baselines.
// Returns wins for player 0; winners array (size num_games) gets +-1.
int gob_play_match(int num_games, int depth_p0, int depth_p1, uint64_t seed,
                   int max_plies, int8_t* winners) {
  uint64_t rng = seed | 1;
  int wins0 = 0;
  for (int g = 0; g < num_games; ++g) {
    int8_t b[27] = {0};
    int player = 0;
    int8_t w = 0;
    for (int ply = 0; ply < max_plies; ++ply) {
      int a;
      const int depth = player == 0 ? depth_p0 : depth_p1;
      if (depth <= 0) {
        a = random_from_mask(legal_mask_impl(b, player), &rng);
      } else {
        a = gob_greedy_action(b, player, depth, &rng);
      }
      if (a < 0) break;
      apply_impl(b, player, a);
      const int ww = winner_impl(b);
      if (ww != 0) {
        w = static_cast<int8_t>(ww);
        break;
      }
      player = 1 - player;
    }
    if (winners) winners[g] = w;
    if (w == 1) ++wins0;
  }
  return wins0;
}

}  // extern "C"
