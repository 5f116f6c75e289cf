// Native Gobblet rules engine + greedy and alpha-beta search.
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

// ---------------------------------------------------------------------------
// Alpha-beta expert (beyond-reference: the reference's strongest scripted
// agent is the depth-3 greedy scan, greedy_policy.py:158-208).
//
// Iterative-deepening negamax with a Zobrist-keyed transposition table and
// a line/material/center evaluation.  A per-game salt adds a tiny
// hash-derived jitter to leaf evals so repeated matches explore different
// but equally-strong lines; the salt is mixed into the TT key so entries
// from different games never alias.
// ---------------------------------------------------------------------------

constexpr int kWin = 30000;
constexpr int kWinThreshold = 29000;

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

struct Zobrist {
  uint64_t piece[27][13];  // index: signed piece value + 6 (6 == empty, 0)
  uint64_t side;
  Zobrist() {
    uint64_t s = 0xC0FFEE123456789AULL;
    for (auto& cell : piece)
      for (auto& v : cell) v = splitmix64(s++);
    for (auto& cell : piece) cell[6] = 0;  // empty contributes nothing
    side = splitmix64(s);
  }
};
const Zobrist kZobrist;

inline uint64_t position_hash(const int8_t* b, int player) {
  uint64_t h = player ? kZobrist.side : 0;
  for (int i = 0; i < 27; ++i) h ^= kZobrist.piece[i][b[i] + 6];
  return h;
}

// --- Canonical hashing for the exact solver ---------------------------------
// Two collapses that are exact value-equivalences of the game:
//  * twin pieces: same-size same-color pieces are interchangeable (only the
//    action encoding distinguishes them), so hash by signed SIZE, not id;
//  * the 8 dihedral board symmetries (applied to all three levels at once).
// TT moves from a collapsed sibling may be illegal in this orientation —
// harmless, they are only used for move ordering.

struct SymTables {
  int perm[8][9];            // cell permutation per symmetry
  uint64_t z[27][7];         // zobrist keys for signed size -3..3 (+3 idx)
  SymTables() {
    for (int t = 0; t < 8; ++t)
      for (int c = 0; c < 3; ++c)
        for (int r = 0; r < 3; ++r) {
          int rr = r, cc = c;
          if (t & 4) { const int tmp = rr; rr = cc; cc = tmp; }  // transpose
          if (t & 1) rr = 2 - rr;
          if (t & 2) cc = 2 - cc;
          perm[t][c * 3 + r] = cc * 3 + rr;  // column-major cells (board.py:14)
        }
    uint64_t s = 0xB16B00B5CAFEF00DULL;
    for (auto& cell : z)
      for (auto& v : cell) v = splitmix64(s++);
    for (auto& cell : z) cell[3] = 0;  // empty contributes nothing
  }
};
const SymTables kSym;

inline uint64_t position_hash_canonical(const int8_t* b, int player) {
  uint64_t h[8];
  const uint64_t side = player ? kZobrist.side : 0;
  for (int t = 0; t < 8; ++t) h[t] = side;
  for (int lvl = 0; lvl < 3; ++lvl) {
    const int8_t* row = b + lvl * 9;
    for (int i = 0; i < 9; ++i) {
      const int8_t v = row[i];
      if (v == 0) continue;
      const int cv = v > 0 ? (v + 1) / 2 : -((1 - v) / 2);  // signed size
      for (int t = 0; t < 8; ++t)
        h[t] ^= kSym.z[lvl * 9 + kSym.perm[t][i]][cv + 3];
    }
  }
  uint64_t m = h[0];
  for (int t = 1; t < 8; ++t)
    if (h[t] < m) m = h[t];
  return m;
}

struct TTEntry {
  uint64_t key;
  int16_t score;
  int8_t depth;
  uint8_t flag;  // 0 unused, 1 exact, 2 lower bound, 3 upper bound
  int8_t move;
};

constexpr size_t kTTBits = 21;  // 2M entries, 32 MiB
TTEntry* tt_table = nullptr;

// Solver table: the exact solve walks far more unique positions than a
// per-move search, so it gets its own, larger namespace (kept separate so
// salted play entries never alias proof entries).
constexpr size_t kSolveTTBits = 27;  // 128M entries, 2 GiB
TTEntry* tt_solve_table = nullptr;

inline TTEntry* tt_probe_in(TTEntry** table, size_t bits, uint64_t h) {
  if (!*table) {
    *table = new TTEntry[size_t{1} << bits]();
  }
  return &(*table)[h >> (64 - bits)];
}

inline TTEntry* tt_probe(uint64_t h) {
  return tt_probe_in(&tt_table, kTTBits, h);
}

// Static move-ordering: large pieces first, center before edges/corners.
struct StaticOrder {
  int order[kActions];
  StaticOrder() {
    const int cell_bonus[9] = {1, 0, 1, 0, 2, 0, 1, 0, 1};
    int scored[kActions];
    for (int a = 0; a < kActions; ++a)
      scored[a] = piece_size(action_piece(a)) * 4 + cell_bonus[action_pos(a)];
    for (int i = 0; i < kActions; ++i) order[i] = i;
    for (int i = 1; i < kActions; ++i) {  // insertion sort, descending
      int a = order[i], j = i - 1;
      while (j >= 0 && scored[order[j]] < scored[a]) {
        order[j + 1] = order[j];
        --j;
      }
      order[j + 1] = a;
    }
  }
};
const StaticOrder kOrder;

// Evaluation from player 0's perspective: open-line potential, exposed
// material (bigger tops are harder to gobble), center control.
inline int eval_white(const int8_t* b) {
  int8_t flat[9];
  flat_board(b, flat);
  static const int kLineTab[4] = {0, 4, 24, 0};  // 3-in-row handled as win
  int score = 0;
  for (const auto& line : kLines) {
    int p = 0, n = 0;
    for (int j = 0; j < 3; ++j) {
      const int8_t v = flat[line[j]];
      p += v > 0;
      n += v < 0;
    }
    if (n == 0) score += kLineTab[p];
    if (p == 0) score -= kLineTab[n];
  }
  for (int i = 0; i < 9; ++i) {
    const int8_t v = flat[i];
    if (v > 0) score += 2 + piece_size(v);
    else if (v < 0) score -= 2 + piece_size(-v);
  }
  if (flat[4] > 0) score += 4;
  else if (flat[4] < 0) score -= 4;
  return score;
}

constexpr int kMaxPly = 64;

struct SearchCtx {
  uint64_t salt;  // per-game eval jitter / TT namespace (0 + exact => solver)
  long nodes;
  bool exact = false;        // solver mode: no leaf jitter, solver TT
  int killers[kMaxPly][2];   // beta-cutoff moves per ply
  int history[2][kActions];  // cutoff frequency per player/action

  TTEntry* probe(uint64_t h) {
    return exact ? tt_probe_in(&tt_solve_table, kSolveTTBits, h)
                 : tt_probe(h);
  }
};

// Principal-variation negamax with TT / killer / history move ordering.
int negamax(int8_t* b, int player, int depth, int alpha, int beta, int ply,
            SearchCtx* ctx) {
  // Node entry: the previous move may have completed a line (including the
  // self-uncovering loss, board.py:96-101 semantics via winner_impl).
  const int w = winner_impl(b);
  const int my_sign = player == 0 ? 1 : -1;
  if (w != 0) return w == my_sign ? kWin - ply : -(kWin - ply);
  if (depth <= 0) {
    int jitter = 0;
    if (!ctx->exact) {  // exact mode never jitters: skip the 27-cell hash
      const uint64_t h = position_hash(b, player);
      jitter = static_cast<int>(splitmix64(h ^ ctx->salt) & 3) - 1;
    }
    const int e = eval_white(b) + jitter;
    return player == 0 ? e : -e;
  }
  ++ctx->nodes;

  const uint64_t h = ctx->exact ? position_hash_canonical(b, player)
                                : position_hash(b, player) ^ ctx->salt;
  TTEntry* e = ctx->probe(h);
  int tt_move = -1;
  if (e->flag && e->key == h) {
    tt_move = e->move;
    if (e->depth >= depth) {
      // Mate-distance adjustment: stored scores are node-relative.
      int s = e->score;
      if (s > kWinThreshold) s -= ply;
      else if (s < -kWinThreshold) s += ply;
      if (e->flag == 1) return s;
      if (e->flag == 2 && s >= beta) return s;
      if (e->flag == 3 && s <= alpha) return s;
    }
  }

  const uint64_t mask = legal_mask_impl(b, player);
  if (mask == 0) return 0;  // unreachable in practice (a player always moves)

  // Score + insertion-sort the legal moves (<= 54 of them).
  const int k0 = ply < kMaxPly ? ctx->killers[ply][0] : -1;
  const int k1 = ply < kMaxPly ? ctx->killers[ply][1] : -1;
  int moves[kActions], scores[kActions], n = 0;
  for (int idx = 0; idx < kActions; ++idx) {
    const int a = kOrder.order[idx];
    if (!((mask >> a) & 1)) continue;
    int s = kActions - idx;  // static order as the base
    if (a == tt_move) s = 1 << 26;
    else if (a == k0) s = 1 << 24;
    else if (a == k1) s = (1 << 24) - 1;
    else s += ctx->history[player][a];
    int j = n++;
    while (j > 0 && scores[j - 1] < s) {
      moves[j] = moves[j - 1];
      scores[j] = scores[j - 1];
      --j;
    }
    moves[j] = a;
    scores[j] = s;
  }

  const int alpha0 = alpha;
  int best = -kWin - 1, best_move = -1;
  for (int i = 0; i < n; ++i) {
    const int a = moves[i];
    int8_t child[27];
    std::memcpy(child, b, 27);
    apply_impl(child, player, a);
    int s;
    if (i == 0) {
      s = -negamax(child, 1 - player, depth - 1, -beta, -alpha, ply + 1, ctx);
    } else {  // PVS: null-window probe, re-search on fail-high
      s = -negamax(child, 1 - player, depth - 1, -alpha - 1, -alpha, ply + 1,
                   ctx);
      if (s > alpha && s < beta) {
        s = -negamax(child, 1 - player, depth - 1, -beta, -alpha, ply + 1,
                     ctx);
      }
    }
    if (s > best) {
      best = s;
      best_move = a;
      if (s > alpha) alpha = s;
      if (alpha >= beta) {
        if (ply < kMaxPly && a != k0) {
          ctx->killers[ply][1] = ctx->killers[ply][0];
          ctx->killers[ply][0] = a;
        }
        ctx->history[player][a] += depth * depth;
        if (ctx->history[player][a] > (1 << 20)) {  // keep below killer rank
          for (auto& row : ctx->history)
            for (int& v : row) v >>= 1;
        }
        break;
      }
    }
  }

  int stored = best;
  if (stored > kWinThreshold) stored += ply;
  else if (stored < -kWinThreshold) stored -= ply;
  e->key = h;
  e->score = static_cast<int16_t>(stored);
  e->depth = static_cast<int8_t>(depth);
  e->flag = best <= alpha0 ? 3 : (best >= beta ? 2 : 1);
  e->move = static_cast<int8_t>(best_move);
  return best;
}

int alphabeta_action_impl(const int8_t* board, int player, int depth,
                          uint64_t salt) {
  SearchCtx ctx{};
  ctx.salt = splitmix64(salt);
  for (auto& k : ctx.killers) k[0] = k[1] = -1;
  int8_t b[27];
  std::memcpy(b, board, 27);
  const uint64_t mask = legal_mask_impl(b, player);
  if (mask == 0) return -1;

  int best_move = __builtin_ctzll(mask);
  for (int d = 1; d <= depth; ++d) {
    int alpha = -kWin - 1;
    int move = best_move;
    // Search the previous iteration's best move first.
    for (int idx = -1; idx < kActions; ++idx) {
      const int a = idx < 0 ? best_move : kOrder.order[idx];
      if (!((mask >> a) & 1)) continue;
      if (idx >= 0 && a == best_move) continue;
      int8_t child[27];
      std::memcpy(child, b, 27);
      apply_impl(child, player, a);
      const int s = -negamax(child, 1 - player, d - 1, -kWin - 1, -alpha, 1,
                             &ctx);
      if (s > alpha) {
        alpha = s;
        move = a;
      }
    }
    best_move = move;
    if (alpha > kWinThreshold) break;  // proven win: no deeper search needed
  }
  return best_move;
}

// Iterative-deepening alpha-beta move choice; salt varies play between
// games without changing strength (see alphabeta_action_impl).
int gob_alphabeta_action(const int8_t* board, int player, int depth,
                         uint64_t salt) {
  return alphabeta_action_impl(board, player, depth, salt);
}

// ---------------------------------------------------------------------------
// Exact solver (ground-truth oracle).
//
// Deterministic iterative-deepening negamax with no leaf jitter and a
// dedicated 128M-entry (2 GiB) transposition table.  A returned |score| above the
// mate threshold is a PROVEN forced win/loss within the searched horizon:
// mate scores (kWin - ply) can only arise from actual winner_impl() hits,
// heuristic leaves are bounded far below the threshold, and alpha-beta /
// TT bounds preserve proven values (standard mate-distance-adjusted TT).
// The game itself has no draw-by-repetition rule (the reference plays to
// a win or a ply cap), so a depth-limited proof is a proof of forced win
// within that many plies of any play.
//
// Caveat: "proven" is modulo 64-bit Zobrist key collisions in the shared
// transposition table (canonical min-of-8 hash, full-key compare).  Over
// the ~1e8-1e9 nodes of a root solve a cross-position collision is
// vanishingly unlikely (expected collisions ~ n^2/2^64 < 1e-1 even at 1e9
// nodes, and a collision only matters if it flips a bound on the proof
// path), but the proof is probabilistic, not certified.  The committed
// 13-ply win is independently corroborated by the exploitability audit:
// the oracle wins 100% of games as P1 against every agent (docs/RESULTS.md).
// ---------------------------------------------------------------------------

// Solve `board` with `player` to move, deepening to at most max_depth.
// Stops early once the root value is proven.  Outputs: best root move,
// node-relative score (mate scale +-(30000 - plies)), proven flag, the
// depth at which the final score was obtained.  Returns nodes searched.
long gob_solve(const int8_t* board, int player, int max_depth,
               int32_t* out_move, int32_t* out_score, int32_t* out_proven,
               int32_t* out_depth) {
  SearchCtx ctx{};
  ctx.exact = true;
  ctx.salt = 0;
  for (auto& k : ctx.killers) k[0] = k[1] = -1;
  int8_t b[27];
  std::memcpy(b, board, 27);
  const uint64_t mask = legal_mask_impl(b, player);
  if (out_move) *out_move = -1;
  if (out_score) *out_score = 0;
  if (out_proven) *out_proven = 0;
  if (out_depth) *out_depth = 0;
  if (mask == 0 || winner_impl(b) != 0) return 0;

  int best_move = __builtin_ctzll(mask);
  int best_score = 0;
  int reached = 0;
  for (int d = 1; d <= max_depth; ++d) {
    int alpha = -kWin - 1;
    int move = best_move;
    for (int idx = -1; idx < kActions; ++idx) {
      const int a = idx < 0 ? best_move : kOrder.order[idx];
      if (!((mask >> a) & 1)) continue;
      if (idx >= 0 && a == best_move) continue;
      int8_t child[27];
      std::memcpy(child, b, 27);
      apply_impl(child, player, a);
      const int s = -negamax(child, 1 - player, d - 1, -kWin - 1, -alpha, 1,
                             &ctx);
      if (s > alpha) {
        alpha = s;
        move = a;
      }
    }
    best_move = move;
    best_score = alpha;
    reached = d;
    if (alpha > kWinThreshold || alpha < -kWinThreshold) break;
  }
  if (out_move) *out_move = best_move;
  if (out_score) *out_score = best_score;
  if (out_proven) *out_proven =
      (best_score > kWinThreshold || best_score < -kWinThreshold) ? 1 : 0;
  if (out_depth) *out_depth = reached;
  return ctx.nodes;
}

// Free the solver TT (it is 2 GiB once touched; tests release it).
void gob_solve_tt_clear() {
  delete[] tt_solve_table;
  tt_solve_table = nullptr;
}

// Perfect-play move: the exact solver's choice at `depth`.  In a proven-won
// position this converts the win; `salt` breaks ties only among moves that
// preserve the proven score (diversity without giving anything away).
// Unproven positions fall back to the deterministic solver move.
int gob_solve_action(const int8_t* board, int player, int depth,
                     uint64_t salt) {
  SearchCtx ctx{};
  ctx.exact = true;
  ctx.salt = 0;
  for (auto& k : ctx.killers) k[0] = k[1] = -1;
  int8_t b[27];
  std::memcpy(b, board, 27);
  const uint64_t mask = legal_mask_impl(b, player);
  if (mask == 0) return -1;

  // Pass 1: alpha-raising root search (iterative deepening for ordering).
  int best_move = __builtin_ctzll(mask);
  int best = -kWin - 1;
  int proof_d = depth;
  for (int d = 1; d <= depth; ++d) {
    int alpha = -kWin - 1;
    int move = best_move;
    for (int idx = -1; idx < kActions; ++idx) {
      const int a = idx < 0 ? best_move : kOrder.order[idx];
      if (!((mask >> a) & 1)) continue;
      if (idx >= 0 && a == best_move) continue;
      int8_t child[27];
      std::memcpy(child, b, 27);
      apply_impl(child, player, a);
      const int s = -negamax(child, 1 - player, d - 1, -kWin - 1, -alpha, 1,
                             &ctx);
      if (s > alpha) {
        alpha = s;
        move = a;
      }
    }
    best_move = move;
    best = alpha;
    proof_d = d;
    if (best > kWinThreshold || best < -kWinThreshold) break;
  }
  if (best <= kWinThreshold) return best_move;  // deterministic best defense

  // Proven win: pass 2 collects every equally-fast mate with cheap
  // null-window probes (fail-soft: result >= best proves score == best,
  // since pass 1 established best as the maximum).
  uint64_t wins = 1ULL << best_move;
  for (int a = 0; a < kActions; ++a) {
    if (!((mask >> a) & 1) || a == best_move) continue;
    int8_t child[27];
    std::memcpy(child, b, 27);
    apply_impl(child, player, a);
    const int s = -negamax(child, 1 - player, proof_d - 1, -best, -(best - 1),
                           1, &ctx);
    if (s >= best) wins |= 1ULL << a;
  }
  // xor-fold (injective) rather than `salt | 1`, which collapsed every
  // even/odd salt pair onto one tie-break stream
  uint64_t rng = splitmix64(salt ^ 0xD1B54A32D192ED03ULL);
  return random_from_mask(wins, &rng);
}

// Batched alpha-beta over n independent positions (jax.pure_callback entry;
// boards row-major int8[n,27] level-major, players int32[n]).
void gob_alphabeta_batch(const int8_t* boards, const int32_t* players, int n,
                         int depth, uint64_t seed, int32_t* out_actions) {
  for (int i = 0; i < n; ++i) {
    out_actions[i] = alphabeta_action_impl(
        boards + 27 * i, players[i], depth, seed + 0x9E37 * (i + 1));
  }
}

// Batched exact-solver moves (the ground-truth oracle as a batch policy;
// per-lane salt varies tie-breaking among equally-fast proven wins only).
void gob_solve_batch(const int8_t* boards, const int32_t* players, int n,
                     int depth, uint64_t seed, int32_t* out_actions) {
  for (int i = 0; i < n; ++i) {
    out_actions[i] = gob_solve_action(boards + 27 * i, players[i], depth,
                                      seed + 0x9E37 * (i + 1));
  }
}

// Native match driver over scripted agents.
// kind: 0 = random-admissible, 1 = greedy(depth), 2 = alphabeta(depth),
// 3 = exact solver (gob_solve_action, depth = proof horizon).
// Returns wins for player 0; winners (size num_games) records +-1 / 0.
int gob_play_match2(int num_games, int kind0, int depth0, int kind1,
                    int depth1, uint64_t seed, int max_plies,
                    int8_t* winners) {
  uint64_t rng = seed | 1;
  int wins0 = 0;
  for (int g = 0; g < num_games; ++g) {
    int8_t b[27] = {0};
    int player = 0;
    int8_t w = 0;
    for (int ply = 0; ply < max_plies; ++ply) {
      const int kind = player == 0 ? kind0 : kind1;
      const int depth = player == 0 ? depth0 : depth1;
      int a;
      if (kind == 3) {
        a = gob_solve_action(b, player, depth,
                             seed + 0x51ED * (g + 1) + player);
      } else if (kind == 2) {
        a = alphabeta_action_impl(b, player, depth,
                                  seed + 0x51ED * (g + 1) + player);
      } else if (kind == 1) {
        a = gob_greedy_action(b, player, depth, &rng);
      } else {
        a = random_from_mask(legal_mask_impl(b, player), &rng);
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
