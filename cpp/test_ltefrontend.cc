// Unit tests for the native frontend — a *real* C++ test suite where the
// reference ships an empty CppUnit scaffold (lib/qa_ltetrigger.cc:33-38,
// registration commented out in lib/CMakeLists.txt:94).
#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

extern "C" {
void lf_deinterleave(const float*, int64_t, float*, float*);
struct lf_decimator;
lf_decimator* lf_decimator_create(int, const float*, int);
void lf_decimator_destroy(lf_decimator*);
int64_t lf_decimate(const lf_decimator*, const float*, int64_t, float*);
struct lf_ring;
lf_ring* lf_ring_create(int64_t);
void lf_ring_destroy(lf_ring*);
int64_t lf_ring_available(const lf_ring*);
int64_t lf_ring_write(lf_ring*, const float*, int64_t);
int64_t lf_ring_read(lf_ring*, float*, int64_t);
}

static int failures = 0;
#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);       \
      ++failures;                                                       \
    }                                                                   \
  } while (0)

static void test_deinterleave() {
  float in[8] = {1, 2, 3, 4, 5, 6, 7, 8};
  float re[4], im[4];
  lf_deinterleave(in, 4, re, im);
  CHECK(re[0] == 1 && im[0] == 2 && re[3] == 7 && im[3] == 8);
}

static void test_decimator_dc_gain() {
  // unity-DC-gain filter: decimating a constant must preserve it
  const int ratio = 4, ntaps = 64;
  std::vector<float> taps(ntaps, 1.0f / ntaps);
  lf_decimator* d = lf_decimator_create(ratio, taps.data(), ntaps);
  std::vector<float> in(2 * 1024);
  for (int i = 0; i < 1024; ++i) { in[2 * i] = 2.0f; in[2 * i + 1] = -3.0f; }
  std::vector<float> out(2 * 256);
  int64_t n = lf_decimate(d, in.data(), 1024, out.data());
  CHECK(n == 256);
  // interior samples (away from edge taps) must equal the input constant
  CHECK(std::fabs(out[2 * 64] - 2.0f) < 1e-5);
  CHECK(std::fabs(out[2 * 64 + 1] + 3.0f) < 1e-5);
  lf_decimator_destroy(d);
}

static void test_ring_wrap() {
  lf_ring* r = lf_ring_create(100);
  std::vector<float> buf(2 * 80), out(2 * 80);
  for (int round = 0; round < 7; ++round) {   // forces wraparound
    for (int i = 0; i < 80; ++i) {
      buf[2 * i] = float(round * 80 + i);
      buf[2 * i + 1] = -buf[2 * i];
    }
    CHECK(lf_ring_write(r, buf.data(), 80) == 80);
    CHECK(lf_ring_available(r) == 80);
    CHECK(lf_ring_read(r, out.data(), 80) == 80);
    for (int i = 0; i < 80; ++i)
      CHECK(out[2 * i] == float(round * 80 + i));
  }
  // capacity clamp
  std::vector<float> big(2 * 200, 1.0f);
  CHECK(lf_ring_write(r, big.data(), 200) == 100);
  lf_ring_destroy(r);
}

int main() {
  test_deinterleave();
  test_decimator_dc_gain();
  test_ring_wrap();
  if (failures) {
    std::printf("%d FAILURES\n", failures);
    return 1;
  }
  std::printf("all C++ frontend tests passed\n");
  return 0;
}
