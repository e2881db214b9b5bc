// Sanitizer driver for the native MAS library (SURVEY.md §5: the
// reference's native component gets a sanitizer test target here).
//
// Built standalone with -fsanitize=address,undefined (and optionally
// thread) by tests/test_mas_sanitizers.py and run as a subprocess: it
// exercises the batched OpenMP entry point on ragged random problems and
// self-checks the path invariants (monotone, complete, within bounds).
// Exit 0 = clean under the sanitizer.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" void gradtts_maximum_path(int32_t* paths, float* values,
                                     const int32_t* t_xs, const int32_t* t_ys,
                                     int b, int tx_max, int ty_max);

namespace {

uint64_t rng_state = 0x9E3779B97F4A7C15ull;
float frand() {
  rng_state = rng_state * 6364136223846793005ull + 1442695040888963407ull;
  return static_cast<float>((rng_state >> 40) & 0xFFFFFF) / 0xFFFFFF - 0.5f;
}

}  // namespace

int main() {
  const int B = 13, TX = 37, TY = 89;
  std::vector<int32_t> paths(static_cast<size_t>(B) * TX * TY, 0);
  std::vector<float> values(static_cast<size_t>(B) * TX * TY);
  std::vector<int32_t> txs(B), tys(B);
  for (int i = 0; i < B; ++i) {
    txs[i] = 1 + (i * 3) % TX;
    tys[i] = txs[i] + (i * 7) % (TY - txs[i]);
    for (size_t j = 0; j < static_cast<size_t>(TX) * TY; ++j)
      values[static_cast<size_t>(i) * TX * TY + j] = frand();
  }

  gradtts_maximum_path(paths.data(), values.data(), txs.data(), tys.data(),
                       B, TX, TY);

  for (int i = 0; i < B; ++i) {
    const int32_t* p = paths.data() + static_cast<size_t>(i) * TX * TY;
    int prev_x = 0;
    for (int y = 0; y < tys[i]; ++y) {
      int ones = 0, xi = -1;
      for (int x = 0; x < txs[i]; ++x)
        if (p[x * TY + y]) { ++ones; xi = x; }
      if (ones != 1) { std::fprintf(stderr, "col %d of item %d has %d ones\n", y, i, ones); return 1; }
      if (xi < prev_x || xi > prev_x + 1) { std::fprintf(stderr, "non-monotone at %d,%d\n", i, y); return 1; }
      prev_x = xi;
    }
    if (prev_x != txs[i] - 1) { std::fprintf(stderr, "incomplete path %d\n", i); return 1; }
    // nothing outside the valid region
    for (int x = 0; x < TX; ++x)
      for (int y = 0; y < TY; ++y)
        if ((x >= txs[i] || y >= tys[i]) && p[x * TY + y]) {
          std::fprintf(stderr, "write outside region %d\n", i); return 1;
        }
  }
  std::puts("MAS sanitizer run clean");
  return 0;
}
