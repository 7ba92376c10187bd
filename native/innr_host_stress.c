/* Sanitizer stress harness for the threaded native runtime.
 *
 * The pthread row encoders (innr_host.c) rely on disjoint output ranges
 * for determinism; this harness makes that claim *checked* rather than
 * argued (VERDICT r2 item 8): built and run under -fsanitize=address and
 * -fsanitize=thread by scripts/build_native.sh sanitize, it drives every
 * multithreaded entry point over boundary-hostile shapes — thread counts
 * that split the row range at non-multiples of the chunk size, row
 * lengths with odd word counts and ragged final words, empty docs,
 * thread counts above the row count and above INNR_MAX_THREADS — and
 * asserts bit-identity between the serial and threaded encoders for
 * every combination. Exit 0 iff all checks pass and no sanitizer fires.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

void innr_pack_binary_rows(const float *, int64_t, int64_t, float, uint32_t *);
void innr_pack_ternary_rows(const float *, int64_t, int64_t, float,
                            uint32_t *, uint32_t *);
void innr_quantize_u8_rows(const float *, int64_t, int64_t, float, float,
                           uint8_t *);
void innr_pack_binary_rows_mt(const float *, int64_t, int64_t, float,
                              uint32_t *, int32_t);
void innr_pack_ternary_rows_mt(const float *, int64_t, int64_t, float,
                               uint32_t *, uint32_t *, int32_t);
void innr_quantize_u8_rows_mt(const float *, int64_t, int64_t, float, float,
                              uint8_t *, int32_t);
void innr_minhash_rows(const uint64_t *, const int64_t *, int64_t, int32_t,
                       uint32_t *);
void innr_minhash_rows_mt(const uint64_t *, const int64_t *, int64_t, int32_t,
                          uint32_t *, int32_t);
void innr_topk_insert_batch(const float *, const uint32_t *, int64_t, int32_t,
                            float *, uint32_t *, int32_t *);
uint64_t innr_hamming_words(const uint32_t *, const uint32_t *, int64_t);

static uint64_t rng_state = 0x12345678ULL;
static uint64_t xorshift(void) {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}
static float frand(void) {
  return (float)((int64_t)(xorshift() % 2000) - 1000) / 250.0f;
}

static int failures = 0;
#define CHECK(cond, msg)                                                 \
  do {                                                                   \
    if (!(cond)) {                                                       \
      fprintf(stderr, "FAIL: %s (%s:%d)\n", msg, __FILE__, __LINE__);    \
      ++failures;                                                        \
    }                                                                    \
  } while (0)

/* rows x n chosen so chunk = ceil(rows/threads) splits at non-multiples;
 * n values hit odd word counts (n=33 -> 2 words with 1 ragged bit,
 * n=95 -> 3 words, n=128 exact). */
static const int64_t ROWS[] = {1, 7, 65, 130, 257};
static const int64_t DIMS[] = {1, 31, 33, 95, 128};
static const int32_t THREADS[] = {1, 2, 3, 7, 64, 65, 300};

static void stress_encoders(void) {
  for (size_t ri = 0; ri < sizeof ROWS / sizeof *ROWS; ++ri) {
    for (size_t di = 0; di < sizeof DIMS / sizeof *DIMS; ++di) {
      int64_t rows = ROWS[ri], n = DIMS[di];
      int64_t words = (n + 31) / 32;
      float *v = malloc((size_t)(rows * n) * sizeof(float));
      for (int64_t i = 0; i < rows * n; ++i) v[i] = frand();

      uint32_t *b_ser = malloc((size_t)(rows * words) * 4);
      uint32_t *b_mt = malloc((size_t)(rows * words) * 4);
      uint32_t *p_ser = malloc((size_t)(rows * words) * 4);
      uint32_t *p_mt = malloc((size_t)(rows * words) * 4);
      uint32_t *g_ser = malloc((size_t)(rows * words) * 4);
      uint32_t *g_mt = malloc((size_t)(rows * words) * 4);
      uint8_t *u_ser = malloc((size_t)(rows * n));
      uint8_t *u_mt = malloc((size_t)(rows * n));

      innr_pack_binary_rows(v, rows, n, 0.1f, b_ser);
      innr_pack_ternary_rows(v, rows, n, 0.2f, p_ser, g_ser);
      innr_quantize_u8_rows(v, rows, n, 4.0f, -2.0f, u_ser);

      for (size_t ti = 0; ti < sizeof THREADS / sizeof *THREADS; ++ti) {
        int32_t t = THREADS[ti];
        memset(b_mt, 0xAA, (size_t)(rows * words) * 4);
        memset(p_mt, 0xAA, (size_t)(rows * words) * 4);
        memset(g_mt, 0xAA, (size_t)(rows * words) * 4);
        memset(u_mt, 0xAA, (size_t)(rows * n));
        innr_pack_binary_rows_mt(v, rows, n, 0.1f, b_mt, t);
        innr_pack_ternary_rows_mt(v, rows, n, 0.2f, p_mt, g_mt, t);
        innr_quantize_u8_rows_mt(v, rows, n, 4.0f, -2.0f, u_mt, t);
        CHECK(memcmp(b_ser, b_mt, (size_t)(rows * words) * 4) == 0,
              "binary mt != serial");
        CHECK(memcmp(p_ser, p_mt, (size_t)(rows * words) * 4) == 0,
              "ternary pos mt != serial");
        CHECK(memcmp(g_ser, g_mt, (size_t)(rows * words) * 4) == 0,
              "ternary neg mt != serial");
        CHECK(memcmp(u_ser, u_mt, (size_t)(rows * n)) == 0,
              "u8 mt != serial");
      }
      free(v); free(b_ser); free(b_mt); free(p_ser); free(p_mt);
      free(g_ser); free(g_mt); free(u_ser); free(u_mt);
    }
  }
}

static void stress_minhash(void) {
  /* ragged docs including empty ones, thread counts splitting unevenly */
  int64_t n_docs = 203;
  int32_t n_slots = 17;
  int64_t *offsets = malloc((size_t)(n_docs + 1) * sizeof(int64_t));
  offsets[0] = 0;
  for (int64_t d = 0; d < n_docs; ++d)
    offsets[d + 1] = offsets[d] + (int64_t)(xorshift() % 9); /* 0..8 items */
  int64_t total = offsets[n_docs];
  uint64_t *items = malloc((size_t)(total ? total : 1) * 8);
  for (int64_t i = 0; i < total; ++i) items[i] = xorshift();

  uint32_t *ser = malloc((size_t)(n_docs * n_slots) * 4);
  uint32_t *mt = malloc((size_t)(n_docs * n_slots) * 4);
  innr_minhash_rows(items, offsets, n_docs, n_slots, ser);
  for (size_t ti = 0; ti < sizeof THREADS / sizeof *THREADS; ++ti) {
    memset(mt, 0x55, (size_t)(n_docs * n_slots) * 4);
    innr_minhash_rows_mt(items, offsets, n_docs, n_slots, mt, THREADS[ti]);
    CHECK(memcmp(ser, mt, (size_t)(n_docs * n_slots) * 4) == 0,
          "minhash mt != serial");
  }
  free(offsets); free(items); free(ser); free(mt);
}

static void stress_topk(void) {
  /* total-order semantics incl. NaN, duplicates, capacity churn */
  const int32_t k = 9;
  float buf_d[9];
  uint32_t buf_i[9];
  int32_t count = 0;
  const int64_t n = 4000;
  float *d = malloc((size_t)n * sizeof(float));
  uint32_t *ids = malloc((size_t)n * 4);
  for (int64_t i = 0; i < n; ++i) {
    d[i] = (i % 97 == 0) ? (0.0f / 0.0f) : frand(); /* sprinkle NaN */
    ids[i] = (uint32_t)i;
  }
  innr_topk_insert_batch(d, ids, n, k, buf_d, buf_i, &count);
  CHECK(count == k, "topk fill");
  for (int32_t i = 1; i < k; ++i) {
    int32_t ka, kb;
    memcpy(&ka, &buf_d[i - 1], 4);
    memcpy(&kb, &buf_d[i], 4);
    ka ^= (int32_t)(((uint32_t)(ka >> 31)) >> 1);
    kb ^= (int32_t)(((uint32_t)(kb >> 31)) >> 1);
    CHECK(ka >= kb, "topk buffer sorted descending by key");
  }
  free(d); free(ids);
}

int main(void) {
  stress_encoders();
  stress_minhash();
  stress_topk();
  if (failures) {
    fprintf(stderr, "%d failures\n", failures);
    return 1;
  }
  printf("native stress: all checks passed\n");
  return 0;
}
