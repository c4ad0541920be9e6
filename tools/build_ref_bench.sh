#!/bin/sh
# Build the reference turbo decoder benchmark driver against the
# UNMODIFIED reference sources (/root/reference, read-only): compiles
# the fec/utils/common/channel/ra objects with the SIMD flags the
# reference's cmake would pick on this host (SSE4.1 + AVX2), generates
# the version headers cmake would, stubs the FFTW-backed dft symbols
# (absent on this box; never executed by the turbo paths), and links
# tools/ref_turbo_bench.c.  Output: $OUT/ref_turbo_bench
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbench}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$OUT/inc/srslte"
sed -e 's/@SRSLTE_VERSION_MAJOR@/1/;s/@SRSLTE_VERSION_MINOR@/3/;s/@SRSLTE_VERSION_PATCH@/0/;s/@SRSLTE_VERSION_STRING@/"1.3.0"/' \
  "$REF/lib/include/srslte/version.h.in" > "$OUT/inc/srslte/version.h"
sed 's/@BUILD_MODE@/Release/;s/@BUILD_INFO@/"manual"/' \
  "$REF/lib/include/srslte/build_info.h.in" > "$OUT/inc/srslte/build_info.h"
cat > "$OUT/dft_stub.c" << 'STUB'
/* no-op dft plan layer, aborting run layer: FFTW is absent on this
   box; pdsch_test INITIALIZES srslte_ofdm objects but never runs a
   transform (its DO_OFDM is undefined), and the turbo paths never
   touch dft at all — any actual transform call aborts loudly. */
#include <stdio.h>
#include <stdlib.h>
static void die(void) { fprintf(stderr, "dft run called\n"); abort(); }
int srslte_dft_plan(void *p, int s, int d, int t) { return 0; }
int srslte_dft_plan_c(void *p, int s, int d) { return 0; }
int srslte_dft_plan_r(void *p, int s, int d) { return 0; }
int srslte_dft_plan_guru_c(void *p, int dir, int size, void *a, void *b,
                           int c, int d, int e, int f, int g) { return 0; }
int srslte_dft_replan(void *p, int s) { return 0; }
int srslte_dft_replan_c(void *p, int s) { return 0; }
void srslte_dft_plan_free(void *p) {}
void srslte_dft_plan_set_norm(void *p, int n) {}
void srslte_dft_plan_set_mirror(void *p, int m) {}
void srslte_dft_plan_set_dc(void *p, int d) {}
void srslte_dft_exit(void) {}
void srslte_dft_run(void *p, void *i, void *o) { die(); }
void srslte_dft_run_c(void *p, void *i, void *o) { die(); }
void srslte_dft_run_c_zerocopy(void *p, void *i, void *o) { die(); }
void srslte_dft_run_guru_c(void *p) { die(); }
void srslte_dft_run_r(void *p, void *i, void *o) { die(); }
STUB
cd "$OUT"
CFLAGS="-O3 -fcommon -mavx2 -msse4.1 -DLV_HAVE_SSE -DLV_HAVE_AVX2 -I inc -I $REF/lib/include"
for f in "$REF"/lib/src/phy/fec/*.c "$REF"/lib/src/phy/utils/*.c \
         "$REF"/lib/src/phy/common/*.c "$REF"/lib/src/phy/channel/ch_awgn.c \
         "$REF"/lib/src/phy/channel/gauss.c "$REF"/lib/src/phy/phch/*.c \
         "$REF"/lib/src/phy/mimo/*.c "$REF"/lib/src/phy/modem/*.c \
         "$REF"/lib/src/phy/scrambling/*.c "$REF"/lib/src/phy/ch_estimation/*.c \
         "$REF"/lib/src/phy/sync/*.c "$REF"/lib/src/phy/agc/*.c \
         "$REF"/lib/src/phy/resampling/*.c "$REF"/lib/src/phy/io/*.c \
         "$REF"/lib/src/phy/dft/ofdm.c "$REF"/lib/src/phy/dft/dft_precoding.c \
         dft_stub.c; do
  gcc $CFLAGS -c "$f" -o "$(basename "${f%.c}").o" 2>/dev/null \
    || echo "skip $(basename "$f")"
done
gcc $CFLAGS -c "$REPO/tools/ref_turbo_bench.c" -o zz_main.o
gcc zz_main.o $(ls *.o | grep -v zz_) -o ref_turbo_bench -lm
echo "built $OUT/ref_turbo_bench"
# the reference's own pdsch_test (decode-processing Mbps, grid-level —
# no transform runs, so the no-op dft layer suffices). Flag-value
# parsing quirk: GNU getopt permutation makes single "-f v" pairs work.
gcc $CFLAGS -I "$REF/lib/src/phy/phch/test" \
  -c "$REF/lib/src/phy/phch/test/pdsch_test.c" -o zz_pdsch_test.o
gcc zz_pdsch_test.o $(ls *.o | grep -v zz_) -o pdsch_test -lm
echo "built $OUT/pdsch_test"
