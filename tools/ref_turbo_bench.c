/* Reference turbo-decoder benchmark + BLER sweep driver (round 5).
 *
 * Drives the REFERENCE decoder (/root/reference lib/src/phy/fec,
 * srslte_tdec_* API) on this host, replacing the flaky CLI and noise
 * conventions of lib/src/phy/fec/test/turbodecoder_test.c:190-281 with
 * the textbook ones used by this repo's tools/bler_sweep.py, so
 * curve-vs-curve BLER parity and measured-on-this-box Mbps are direct:
 *
 *   - sigma = sqrt(N0/2), N0 = 1/(R * Eb/N0_lin), R = 1/3, Es = 1
 *     (the original test passes sigma = sqrt(1/EsN0_lin) to
 *     srslte_ch_awgn_f — whose third argument is the STD, ch_awgn.c —
 *     making its printed Eb/No labels ~3 dB optimistic)
 *   - fixed-point LLR input at 32 int16 units per unit amplitude
 *     (max-log decoders are scale-invariant; same |llr| ~ O(100)
 *     regime as the original test's x100 float->int16 scale)
 *   - per-BLOCK error counting (BLER) in addition to BER
 *   - timing identical to the original: gettimeofday around
 *     srslte_tdec_run_all with fixed iterations, Mbps = K / usec.
 *
 * Build: tools/build_ref_bench.sh   Run: ref_turbo_bench K ITERS IMPL
 *        FRAMES EBNO_DB...          (IMPL: 0=auto,1=GENERIC,2=SSE,...)
 */
#include <math.h>
#include <stdbool.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>

#include "srslte/phy/fec/turbocoder.h"
#include "srslte/phy/fec/turbodecoder.h"
#include "srslte/phy/fec/cbsegm.h"
#include "srslte/phy/utils/bit.h"
#include "srslte/phy/utils/vector.h"

static float rand_gauss(void) {
  float v1, v2, s;
  do {
    v1 = 2.0f * ((float)rand() / RAND_MAX) - 1.0f;
    v2 = 2.0f * ((float)rand() / RAND_MAX) - 1.0f;
    s = v1 * v1 + v2 * v2;
  } while (s >= 1.0f || s == 0.0f);
  return v1 * sqrtf(-2.0f * logf(s) / s);
}

int main(int argc, char **argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s K ITERS IMPL FRAMES EBNO_DB...\n", argv[0]);
    return 1;
  }
  uint32_t k = (uint32_t)atoi(argv[1]);
  int iters = atoi(argv[2]);
  int impl = atoi(argv[3]);
  int frames = atoi(argv[4]);
  k = srslte_cbsegm_cbsize(srslte_cbsegm_cbindex(k));
  uint32_t coded = 3 * k + SRSLTE_TCOD_TOTALTAIL;

  srslte_tcod_t tcod;
  srslte_tdec_t tdec;
  if (srslte_tcod_init(&tcod, k) ||
      srslte_tdec_init_manual(&tdec, k, (srslte_tdec_impl_type_t)impl)) {
    fprintf(stderr, "init failed\n");
    return 1;
  }
  srslte_tdec_force_not_sb(&tdec);

  uint8_t *data_tx = srslte_vec_malloc(k);
  uint8_t *data_rx = srslte_vec_malloc(k);
  uint8_t *data_rx_bytes = srslte_vec_malloc(k / 8 + 8);
  uint8_t *symbols = srslte_vec_malloc(coded);
  int16_t *llr_s = srslte_vec_malloc(coded * sizeof(int16_t));
  srand(1);

  for (int a = 5; a < argc; a++) {
    double ebno_db = atof(argv[a]);
    double ebno = pow(10.0, ebno_db / 10.0);
    double n0 = 1.0 / (ebno / 3.0);      /* R = 1/3, Es = 1 */
    double sigma = sqrt(n0 / 2.0);
    /* max-log decoding is scale-invariant; 32 int units per unit
       amplitude keeps |llr_s| ~ O(100), same regime as the original
       test's x100 (turbodecoder_test.c:251) */
    double scale = 32.0;
    long block_errs = 0, bit_errs = 0;
    double usec_total = 0.0;
    for (int f = 0; f < frames; f++) {
      for (uint32_t j = 0; j < k; j++) data_tx[j] = rand() % 2;
      srslte_tcod_encode(&tcod, data_tx, symbols, k);
      for (uint32_t j = 0; j < coded; j++) {
        double y = (symbols[j] ? 1.0 : -1.0) + sigma * rand_gauss();
        double l = scale * y;            /* 8 units per unit amplitude */
        if (l > 32000) l = 32000;
        if (l < -32000) l = -32000;
        llr_s[j] = (int16_t)l;
      }
      struct timeval t1, t2;
      srslte_tdec_new_cb(&tdec, k);
      gettimeofday(&t1, NULL);
      srslte_tdec_run_all(&tdec, llr_s, data_rx_bytes, iters, k);
      gettimeofday(&t2, NULL);
      usec_total += (t2.tv_sec - t1.tv_sec) * 1e6 +
                    (t2.tv_usec - t1.tv_usec);
      srslte_bit_unpack_vector(data_rx_bytes, data_rx, k);
      long e = 0;
      for (uint32_t j = 0; j < k; j++) e += data_tx[j] != data_rx[j];
      bit_errs += e;
      block_errs += e > 0;
    }
    printf("{\"k\": %u, \"iters\": %d, \"impl\": %d, \"ebno_db\": %.2f, "
           "\"bler\": %.4f, \"ber\": %.3e, \"mbps\": %.1f, "
           "\"usec_per_cb\": %.1f}\n",
           k, iters, impl, ebno_db, (double)block_errs / frames,
           (double)bit_errs / ((double)frames * k),
           (double)k * frames / usec_total, usec_total / frames);
  }
  return 0;
}
