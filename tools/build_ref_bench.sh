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
#include <stdio.h>
#include <stdlib.h>
static void die(void) { fprintf(stderr, "dft stub called\n"); abort(); }
int srslte_dft_plan(void) { die(); return -1; }
int srslte_dft_replan(void) { die(); return -1; }
void srslte_dft_plan_free(void) { die(); }
void srslte_dft_plan_set_norm(void) { die(); }
void srslte_dft_run_c(void) { die(); }
STUB
cd "$OUT"
CFLAGS="-O3 -fcommon -mavx2 -msse4.1 -DLV_HAVE_SSE -DLV_HAVE_AVX2 -I inc -I $REF/lib/include"
for f in "$REF"/lib/src/phy/fec/*.c "$REF"/lib/src/phy/utils/*.c \
         "$REF"/lib/src/phy/common/*.c "$REF"/lib/src/phy/channel/ch_awgn.c \
         "$REF"/lib/src/phy/channel/gauss.c "$REF"/lib/src/phy/phch/ra.c \
         dft_stub.c; do
  gcc $CFLAGS -c "$f" -o "$(basename "${f%.c}").o" 2>/dev/null \
    || echo "skip $(basename "$f")"
done
gcc $CFLAGS -c "$REPO/tools/ref_turbo_bench.c" -o zz_main.o
gcc zz_main.o $(ls *.o | grep -v zz_) -o ref_turbo_bench -lm
echo "built $OUT/ref_turbo_bench"
