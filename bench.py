"""Headline benchmarks: turbo decoder + full receivers, one JSON line.

Primary metric mirrors the reference's turbodecoder_test measurement
(lib/src/phy/fec/test/turbodecoder_test.c:281 prints Mbps per CB size and
iteration count; README.md:25 claims >100 Mbps with SSE4.1/AVX2) at the
same operating point: K=6144, Eb/N0=1.5 dB, 5 iterations, correctness
checked (zero residual bit errors expected at this SNR).

Additional keys carry the full-receiver numbers the reference publishes
(README.md:39-41,58: 150 Mbps 20 MHz MIMO DL, 36 Mbps 10 MHz SISO DL,
50 Mbps 20 MHz UL), measured like pdsch_test.c:446-517 decode-processing
Mbps. Set BENCH_QUICK=1 to skip the receiver benches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
with vs_baseline relative to the reference's 100 Mbps SIMD figure.
All docs' numbers (README.md, docs/BENCHMARKS.md, docs/STATUS.md) are
regenerated from this script's output — it is the single source of truth.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the turbo + receiver programs take minutes to
# compile cold; cached re-runs leave the time budget to the measurements
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BASELINE_MBPS = 100.0  # reference AVX2 turbo decode (README.md:25)
RX_BASELINE = {"20mimo": 150.0, "10siso": 36.0, "20ul": 50.0}


def _sync(x):
    """axon-safe device sync: block_until_ready is async on this backend,
    so read ONE element back (a tiny slice program — never np.asarray the
    full array, that drags megabytes through the tunnel per sync)."""
    return int(x[(0,) * getattr(x, "ndim", 0)])


def bench_turbo():
    from empower_srslte_tpu.ops.fec import TurboDecoder, turbo_encode_np

    k = 6144
    batch = 2048
    iters = 5

    rng = np.random.default_rng(0)
    tile = 8  # host-encode a fraction and tile it: same decode workload
    u0 = rng.integers(0, 2, size=(batch // tile, k)).astype(np.int8)
    u = np.tile(u0, (tile, 1))
    d = np.tile(turbo_encode_np(u0), (tile, 1, 1))
    ebn0 = 10 ** (1.5 / 10)
    n0 = 1.0 / (ebn0 / 3)
    sigma = np.sqrt(n0 / 2)
    y = 1 - 2 * d.astype(np.float64) + sigma * rng.normal(size=d.shape)
    llr = jnp.asarray((4 / n0 * y).astype(np.float32))

    on_tpu = jax.devices()[0].platform != "cpu"
    # bfloat16 metrics on the pallas path (dtype="auto") — the same
    # precision trade the reference's i16/i8 SIMD decoders make
    # (demod_soft.c:39-45); impl auto = the NII tile-major kernel
    # (turbo_decoder_pallas2.py) on TPU.
    dec = TurboDecoder(k=k, iterations=iters, window=256,
                       impl="auto" if on_tpu else "xla")

    # Chain R decodes per dispatch (scalar cross-decode dependency) so the
    # steady-state streaming throughput is measured rather than the
    # host-tunnel's fixed per-dispatch latency — the CPU reference's loop
    # (turbodecoder_test.c:264-281) has no equivalent dispatch cost.
    # The chain rides a lax.scan so XLA compiles ONE decode body — with
    # the scan inside TurboDecoder.decode the whole program holds ~2
    # iteration bodies, keeping the driver's cold compile inside budget.
    # Round-5 note: the tunnel's fixed dispatch cost measured ~15 ms
    # this round (it was ~5 in round 4) — chain length 24 keeps the
    # amortized share under ~0.7 ms/call.
    chain = 24

    @jax.jit
    def fn(llr):
        # scalar cross-call carry: the dependency is a broadcast add
        # that fuses into the decode's first read (a full-size carry
        # add would cost an extra ~0.45 ms HBM pass per chained call)
        def body(carry, _):
            eps, _ = carry
            bits, llr_out = dec.decode(llr + 0.0 * eps)
            return (llr_out[0, 0].astype(llr.dtype), bits), None

        bits0 = jnp.zeros((batch, k), jnp.int8)
        (_, bits), _ = jax.lax.scan(
            body, (jnp.zeros((), llr.dtype), bits0), None, length=chain)
        return bits

    bits = fn(llr)
    errs = int(np.sum(np.asarray(bits) != u))  # also forces full sync
    _sync(bits)  # pre-compile the tiny sync program too

    # several timed trials; report the best (the axon tunnel occasionally
    # stalls a dispatch — the best trial is the honest steady state)
    best = 0.0
    for _ in range(3):
        n_rep = 2
        t0 = time.time()
        for _ in range(n_rep):
            bits = fn(llr)
        _sync(bits)  # serial device stream: syncs all reps (axon-safe)
        dt = (time.time() - t0) / (n_rep * chain)
        best = max(best, batch * k / dt / 1e6)
    return round(best, 1), errs, batch


#: Mid-SNR noise levels (waterfall edge, where the CRC early stop
#: actually iterates): chosen so BLER lands in the 1-50 % band — the
#: operating point the reference's phy_dl_test.c:371-408 sweeps report.
#: (20ul recalibrated round 5: 0.046 sat past the waterfall edge at
#: BLER 14.5-17 % — above the ~10 % first-transmission operating target
#: — flattering Mbps; 0.045 measures BLER ~7 %)
MIDSNR_N0 = {"20mimo": 0.009, "10siso": 0.042, "20ul": 0.045}


def bench_receiver(config: str, batch: int = 256, chain: int = 24,
                   midsnr: bool = False):
    """Decode-processing throughput of the full receivers
    (tools/bench_pdsch.py measurement, BASELINE configs 2/3/4).

    ``chain`` receiver calls ride one dispatch via lax.scan (a scalar
    cross-call dependency prevents CSE), so steady-state on-device
    throughput is measured rather than the axon tunnel's ~5 ms fixed
    per-dispatch latency — the same treatment the turbo bench documents;
    the CPU reference's timing loops (pdsch_test.c:446-517) have no
    equivalent dispatch cost. ``midsnr`` switches the noise level to the
    waterfall edge and reports (bler, iterations) alongside Mbps, so the
    early-stop depth is captured, not asserted.
    """
    from empower_srslte_tpu.models import ra
    from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                                 pdsch_encode)
    from empower_srslte_tpu.ops.equalizer import MimoType
    from empower_srslte_tpu.utils import Cell

    rng = np.random.default_rng(0)
    n0 = MIDSNR_N0[config] if midsnr else 1e-3
    sigma = np.sqrt(n0 / 2)
    if config == "20mimo":
        cell = Cell(nof_prb=100, nof_ports=2, id=1)
        mod, tbs = ra.mcs_to_tbs(27, 100)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                          mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                          nof_codewords=2)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        tb2 = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        hs = (batch, 2, 2, 14, 1200)
        ns = (batch, 2, 14, 1200)
        h_re = rng.normal(size=hs).astype(np.float32)
        h_im = rng.normal(size=hs).astype(np.float32)
        nz_re = (rng.normal(size=ns) * sigma).astype(np.float32)
        nz_im = (rng.normal(size=ns) * sigma).astype(np.float32)

        def make_rx(tb, tb2, h_re, h_im, nz_re, nz_im):
            h = jax.lax.complex(h_re, h_im)
            ports = pdsch_encode(tb, cfg, plan, tb2, plan)
            y = (jnp.einsum("brpsk,bpsk->brsk", h, ports)
                 + jax.lax.complex(nz_re, nz_im))
            return jnp.real(y), jnp.imag(y)

        make_rx = jax.jit(make_rx)
        y_re, y_im = make_rx(*(jnp.asarray(a) for a in
                               (tb, tb2, h_re, h_im, nz_re, nz_im)))
        args = (y_re, y_im, jnp.asarray(h_re), jnp.asarray(h_im))

        def fn(y_re, y_im, h_re, h_im):
            y = jax.lax.complex(y_re, y_im)
            h = jax.lax.complex(h_re, h_im)
            ilist = []
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                y, h, cfg, plan, noise_est=n0, plan2=plan, iters_out=ilist)
            n_it = jnp.max(jnp.stack(ilist)) if ilist \
                else jnp.zeros((), jnp.int32)
            # consume the decoded PAYLOAD fully (not just the CRC flags):
            # dead decoded bits let XLA drop the reassembly stage
            bsum = (jnp.sum(b1.astype(jnp.int32))
                    + jnp.sum(b2.astype(jnp.int32))).astype(jnp.float32)
            return (jnp.sum(ok1) + jnp.sum(ok2)).astype(jnp.int32), \
                n_it, bsum

        bits_per_sf = 2 * tbs
        n_expected = 2 * batch
    elif config == "20ul":
        from empower_srslte_tpu.models.pusch import (PuschConfig,
                                                     pusch_decode,
                                                     pusch_encode)

        cell = Cell(nof_prb=100, nof_ports=1, id=1)
        mod, tbs = ra.mcs_to_tbs(20, 96, dl=False)
        cfg = PuschConfig(cell=cell, sf_idx=1, rnti=0x1234, mod=mod,
                          prb_start=0, n_prb=96)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        ns = (batch, 14, 1200)
        nz_re = (rng.normal(size=ns) * sigma).astype(np.float32)
        nz_im = (rng.normal(size=ns) * sigma).astype(np.float32)

        def make_rx(tb, nz_re, nz_im):
            grid = pusch_encode(tb, cfg, plan)
            hval = jax.lax.complex(jnp.float32(0.95), jnp.float32(0.1))
            y = grid * hval + jax.lax.complex(nz_re, nz_im)
            return jnp.real(y), jnp.imag(y)

        make_rx = jax.jit(make_rx)
        y_re, y_im = make_rx(*(jnp.asarray(a) for a in (tb, nz_re, nz_im)))
        args = (y_re, y_im)

        def fn(y_re, y_im):
            y = jax.lax.complex(y_re, y_im)
            ilist = []
            bits, ok, _ = pusch_decode(y, cfg, plan, noise_est=n0,
                                       iters_out=ilist)
            n_it = jnp.max(jnp.stack(ilist)) if ilist \
                else jnp.zeros((), jnp.int32)
            return jnp.sum(ok).astype(jnp.int32), n_it, \
                jnp.sum(bits.astype(jnp.int32)).astype(jnp.float32)

        bits_per_sf = tbs
        n_expected = batch
    else:  # 10siso
        cell = Cell(nof_prb=50, nof_ports=1, id=1)
        mod, tbs = ra.mcs_to_tbs(23, 50)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        ns = (batch, 1, 14, 600)   # matches the encoder's port axis
        nz_re = (rng.normal(size=ns) * sigma).astype(np.float32)
        nz_im = (rng.normal(size=ns) * sigma).astype(np.float32)

        def make_rx(tb, nz_re, nz_im):
            grid = pdsch_encode(tb, cfg, plan)
            hval = jax.lax.complex(jnp.float32(0.9), jnp.float32(-0.2))
            y = grid * hval + jax.lax.complex(nz_re, nz_im)
            return jnp.real(y), jnp.imag(y)

        make_rx = jax.jit(make_rx)
        y_re, y_im = make_rx(*(jnp.asarray(a) for a in (tb, nz_re, nz_im)))
        args = (y_re, y_im)

        def fn(y_re, y_im):
            y = jax.lax.complex(y_re, y_im)
            hval = jax.lax.complex(jnp.float32(0.9), jnp.float32(-0.2))
            h = jnp.broadcast_to(hval, (batch, 1, 1, 14, 600))
            ilist = []
            bits, ok, _ = pdsch_decode(y, h, cfg, plan, noise_est=n0,
                                       iters_out=ilist)
            n_it = jnp.max(jnp.stack(ilist)) if ilist \
                else jnp.zeros((), jnp.int32)
            return jnp.sum(ok).astype(jnp.int32), n_it, \
                jnp.sum(bits.astype(jnp.int32)).astype(jnp.float32)

        bits_per_sf = tbs
        n_expected = batch

    @jax.jit
    def chained(*cargs):
        # scalar cross-call carry (see bench_turbo note); the carry is
        # the decoded-bit sum, so the payload reassembly is consumed
        def body(carry, _):
            eps, acc, itm = carry
            a0 = cargs[0] + (0.0 * eps).astype(cargs[0].dtype)
            n_ok, n_it, bsum = fn(a0, *cargs[1:])
            return (bsum, acc + n_ok,
                    jnp.maximum(itm, n_it)), None
        (_, acc, itm), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                   jnp.zeros((), jnp.int32)), None, length=chain)
        return acc, itm

    acc, itm = chained(*args)
    n_ok = _sync(acc)
    n_it = _sync(itm)
    best_mbps = best_sfps = 0.0
    for _ in range(3):
        reps = 2
        t0 = time.time()
        r = None
        for _ in range(reps):
            r, _i = chained(*args)
        _sync(r)
        dt = (time.time() - t0) / (reps * chain)
        if batch * bits_per_sf / dt / 1e6 > best_mbps:
            best_mbps = batch * bits_per_sf / dt / 1e6
            best_sfps = batch / dt
    bler = 1.0 - n_ok / float(chain * n_expected)
    return (round(best_mbps, 0), round(best_sfps, 0),
            n_ok == chain * n_expected, n_it, round(bler, 4))


def bench_uedl(batch: int = 256, chain: int = 24, mimo: bool = False):
    """Full-chain UE DL receiver, NO genie anything: time-domain samples
    -> OFDM FFT -> LS channel estimation off the CRS -> pilot noise
    estimate -> PCFICH decode -> blind PDCCH search (every (L, CCE)
    candidate of the UE search space x both monitored DCI sizes, Viterbi
    + CRC16-RNTI) -> PDSCH decode with the ESTIMATED channel.

    This is the measurement the reference publishes live
    (lib/examples/pdsch_ue.c:786-827); the processing-Mbps receivers
    above start at the RE grid with a genie channel (pdsch_test.c
    parity). Default: 10 MHz SISO MCS 23, AWGN at 30 dB.

    ``mimo``: 20 MHz 2x2 TM4 two-codeword variant — per-subframe random
    full-rank 2x2 channel applied in the frequency domain before the
    per-antenna iFFT, CRS channel estimation per (rx, port) pair, SFBC
    control channels — the configuration behind the reference's 150 Mbps
    full-chain headline (README.md:39 there).
    """
    from empower_srslte_tpu.models import ra
    from empower_srslte_tpu.models.dci import format0_1a_size, format1_size
    from empower_srslte_tpu.models.enb_dl import (enb_dl_base_grid,
                                                  enb_dl_gen_signal)
    from empower_srslte_tpu.models.pcfich import pcfich_decode, pcfich_put
    from empower_srslte_tpu.models.pdcch import (pdcch_blind_bits,
                                                 pdcch_encode,
                                                 pdcch_extract_llr,
                                                 ue_search_candidates)
    from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                                 pdsch_encode)
    from empower_srslte_tpu.models.regs import pdcch_nof_cces
    from empower_srslte_tpu.ops.chest import chest_dl, noise_est_pilots
    from empower_srslte_tpu.ops.equalizer import MimoType
    from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
    from empower_srslte_tpu.utils import Cell
    from empower_srslte_tpu.utils.bits import uint_to_bits
    from empower_srslte_tpu.utils.crc import CRC16

    rng = np.random.default_rng(7)
    sf_idx, cfi, rnti = 1, 1, 0x1234
    if mimo:
        cell = Cell(nof_prb=100, nof_ports=2, id=1)
        mod, tbs = ra.mcs_to_tbs(25, 100)
        cfg = PdschConfig(cell=cell, sf_idx=sf_idx, cfi=cfi, rnti=rnti,
                          mod=mod, mimo=MimoType.SPATIAL_MUX,
                          nof_layers=2, nof_codewords=2)
        n_cw, n_rx = 2, 2
        nprb = 100
    else:
        cell = Cell(nof_prb=50, nof_ports=1, id=1)
        mod, tbs = ra.mcs_to_tbs(23, 50)
        cfg = PdschConfig(cell=cell, sf_idx=sf_idx, cfi=cfi, rnti=rnti,
                          mod=mod)
        n_cw, n_rx = 1, 1
        nprb = 50
    plan = cfg.plan(tbs)
    size1 = format1_size(nprb)
    size1a = format0_1a_size(nprb)
    dci_l, dci_cce = 4, 0
    dci_bits = rng.integers(0, 2, size1).astype(np.int8)

    tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    tb2 = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    sf_len = cell.sf_sample_len
    snr_db = 30.0
    # per-subframe well-conditioned 2x2 mixing channel (diag-dominant
    # with random phases): exercises per-(rx, port) chest + 2x2 MMSE
    # without the capture depending on worst-case Rayleigh conditioning
    ph = rng.uniform(0, 2 * np.pi, size=(batch, 2, 2))
    mag = np.where(np.eye(2, dtype=bool)[None], 1.0, 0.35)
    h2 = (mag * np.exp(1j * ph)).astype(np.complex64)

    def make_tx(tb, tb2, h2_re, h2_im, nz_re, nz_im):
        grid = enb_dl_base_grid(cell, sf_idx, batch_shape=(batch,))
        grid = pcfich_put(grid, cfi, cell, sf_idx)
        grid = grid + pdcch_encode(jnp.asarray(dci_bits), rnti, dci_cce,
                                   dci_l, cell, cfi, sf_idx)
        if mimo:
            grid = grid + pdsch_encode(tb, cfg, plan, tb2, plan)
            h2c = jax.lax.complex(h2_re, h2_im)
            grid = jnp.einsum("brp,bpsk->brsk", h2c, grid)
        else:
            grid = grid + pdsch_encode(tb, cfg, plan)
        samples = enb_dl_gen_signal(grid, cell)
        if not mimo:
            samples = samples[..., 0, :]
        p_sig = jnp.mean(jnp.abs(samples) ** 2)
        sigma = jnp.sqrt(p_sig * 10 ** (-snr_db / 10) / 2)
        y = samples + sigma * jax.lax.complex(nz_re, nz_im)
        return jnp.real(y), jnp.imag(y)

    cands = ue_search_candidates(rnti, sf_idx,
                                 pdcch_nof_cces(cell, cfi))
    mask16 = jnp.asarray(uint_to_bits(rnti & 0xFFFF, 16))

    def fn(s_re, s_im):
        samples = jax.lax.complex(s_re, s_im)
        grid = ofdm_rx_sf(samples, cell)        # [B(, rx), S, K]
        if mimo:
            h = jnp.stack(
                [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                            for p in range(2)], axis=1)
                 for r in range(2)], axis=1)    # [B, rx, port, S, K]
            n0 = jnp.maximum(noise_est_pilots(grid[:, 0], cell, sf_idx),
                             1e-7)
            grid0, h0 = grid[:, 0], h[:, 0]     # rx antenna 0 for control
        else:
            h = chest_dl(grid, cell, sf_idx, port=0)
            n0 = jnp.maximum(noise_est_pilots(grid, cell, sf_idx), 1e-7)
            grid0, h0 = grid, h
        cfi_hat, _ = pcfich_decode(grid0, h0, cell, sf_idx,
                                   noise_est=n0[..., None])
        cfi_ok = jnp.sum((cfi_hat == cfi).astype(jnp.int32))
        # blind DCI search: all candidates x both monitored sizes
        llr = pdcch_extract_llr(grid0, h0, cell, cfi, sf_idx,
                                noise_est=n0[..., None])
        # one Viterbi batch per monitored DCI size, every candidate of
        # every aggregation level stacked (pdcch_blind_bits)
        n_det = jnp.zeros((), jnp.int32)
        for size in {size1, size1a}:
            bits = pdcch_blind_bits(llr, cands, size)  # [B, n_cand, k]
            unmasked = jnp.concatenate(
                [bits[..., :size],
                 jnp.bitwise_xor(bits[..., size:], mask16)], axis=-1)
            n_det = n_det + jnp.sum(
                CRC16.jnp_check(unmasked).astype(jnp.int32))
        ilist = []
        if mimo:
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                grid, h, cfg, plan, noise_est=n0[:, None], plan2=plan,
                iters_out=ilist)
            ok_sum = jnp.sum(ok1.astype(jnp.int32)) \
                + jnp.sum(ok2.astype(jnp.int32))
            bsum = (jnp.sum(b1.astype(jnp.int32))
                    + jnp.sum(b2.astype(jnp.int32))).astype(jnp.float32)
        else:
            bits, ok, _ = pdsch_decode(
                grid[:, None], h[:, None, None], cfg, plan,
                noise_est=n0[:, None], iters_out=ilist)
            ok_sum = jnp.sum(ok.astype(jnp.int32))
            bsum = jnp.sum(bits.astype(jnp.int32)).astype(jnp.float32)
        n_it = jnp.max(jnp.stack(ilist)) if ilist \
            else jnp.zeros((), jnp.int32)
        good = ok_sum + jnp.minimum(cfi_ok, batch) \
            + jnp.minimum(n_det, batch)
        return good.astype(jnp.int32), n_it, bsum

    make_tx_j = jax.jit(make_tx)
    nshape = (batch, 2, sf_len) if mimo else (batch, sf_len)
    nz_re = jnp.asarray(rng.normal(size=nshape).astype(np.float32))
    nz_im = jnp.asarray(rng.normal(size=nshape).astype(np.float32))
    s_re, s_im = make_tx_j(jnp.asarray(tb), jnp.asarray(tb2),
                           jnp.asarray(np.real(h2)),
                           jnp.asarray(np.imag(h2)), nz_re, nz_im)
    args = (s_re, s_im)

    @jax.jit
    def chained(s_re, s_im):
        # scalar cross-call carry (see bench_turbo note)
        def body(carry, _):
            eps, acc, itm = carry
            n_good, n_it, bsum = fn(
                s_re + (0.0 * eps).astype(s_re.dtype), s_im)
            return (bsum, acc + n_good,
                    jnp.maximum(itm, n_it)), None
        (_, acc, itm), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                   jnp.zeros((), jnp.int32)), None, length=chain)
        return acc, itm

    acc, itm = chained(*args)
    n_good = _sync(acc)
    n_it = _sync(itm)
    best_mbps = best_sfps = 0.0
    for _ in range(3):
        reps = 2
        t0 = time.time()
        r = None
        for _ in range(reps):
            r, _i = chained(*args)
        _sync(r)
        dt = (time.time() - t0) / (reps * chain)
        if batch * n_cw * tbs / dt / 1e6 > best_mbps:
            best_mbps = batch * n_cw * tbs / dt / 1e6
            best_sfps = batch / dt
    # good counts: pdsch ok (n_cw*batch) + cfi (batch) + dci (batch)
    return (round(best_mbps, 0), round(best_sfps, 0),
            n_good == (n_cw + 2) * batch * chain, n_it)


def bench_latency():
    """Latency of the FULL no-genie ue_dl chain (20 MHz 2x2 TM4, the
    reference's headline configuration) at small batch, against the
    reference's real-time budget: subframes arrive every 1 ms and the
    decode-to-ACK deadline is 4 ms (srsenb/src/phy/txrx.cc:122-126,
    HARQ_DELAY_MS=4 at lib/include/srslte/common/common.h:49).

    ms/call is steady-state per-dispatch device time (chained, honest
    readback sync — the throughput methodology at batch 1/8). A batch of
    B subframes collected over B ms and processed in T ms meets the
    deadline for its OLDEST subframe iff (B - 1) + T <= 4 ms; the keys
    below let the reader place the throughput-optimal batch (256)
    against the deadline-feasible ones.

    Path note: at batch 1/8 the decode dispatcher's fused-feed
    eligibility check (sch._fused_geometry: lane width 128/256) fails,
    so these calls run the CLASSIC extracted de-rate-matching path —
    i.e. the numbers describe what the framework actually executes at
    small batch, which is a different code path than the batch-256
    throughput numbers (stated here and in docs/BENCHMARKS.md).
    """
    out = {}
    for b in (1, 8):
        mbps, sfps, ok, _it = bench_uedl(batch=b, mimo=True)
        ms = round(b / sfps * 1e3, 3) if sfps else None
        out[f"uedl_latency_b{b}_ms"] = ms
        out[f"uedl_latency_b{b}_ok"] = ok
        out[f"uedl_latency_b{b}_deadline_ok"] = (
            ms is not None and (b - 1) + ms <= 4.0)
    return out


def bench_tx(batch: int = 256, chain: int = 24):
    """eNB DL transmit: DL-SCH encode -> scramble -> modulate -> layer
    map/precode -> RE map + CRS -> iFFT to time samples, 20 MHz 2x2 TM4
    two codewords (srslte_enb_dl: put_base + put_pdsch + gen_signal;
    ENCODED Mbps as printed by pdsch_test.c:455)."""
    from empower_srslte_tpu.models import ra
    from empower_srslte_tpu.models.enb_dl import (enb_dl_base_grid,
                                                  enb_dl_gen_signal)
    from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_encode)
    from empower_srslte_tpu.ops.equalizer import MimoType
    from empower_srslte_tpu.utils import Cell

    rng = np.random.default_rng(3)
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(27, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2)
    plan = cfg.plan(tbs)
    tb = jnp.asarray(rng.integers(0, 2, size=(batch, tbs)).astype(np.int8))
    tb2 = jnp.asarray(rng.integers(0, 2, size=(batch, tbs)).astype(np.int8))

    def fn(tb, tb2):
        grid = enb_dl_base_grid(cell, 1, batch_shape=(batch,))
        grid = grid + pdsch_encode(tb, cfg, plan, tb2, plan)
        samples = enb_dl_gen_signal(grid, cell)
        # reduce over EVERY output sample: a strided/sliced consumption
        # lets XLA dead-code whole branches of the encode (e.g. the
        # second antenna's iFFT) and under-measure the work
        return jnp.sum(jnp.abs(samples))

    @jax.jit
    def chained(tb, tb2):
        # cross-call carry via signbit: a DYNAMIC zero (the sum of
        # magnitudes is provably >= 0 to us, not to XLA). An `x * 0`
        # int dependency gets constant-folded and the whole body
        # loop-hoisted — measured as an impossible 12x jump.
        def body(carry, _):
            eps, acc = carry
            tbx = jnp.bitwise_xor(tb, jnp.signbit(eps).astype(tb.dtype))
            s = fn(tbx, tb2)
            return (s, acc + s), None
        (_, acc), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            None, length=chain)
        return acc

    r = chained(tb, tb2)
    _ = float(np.asarray(r))
    best_mbps = 0.0
    for _ in range(3):
        reps = 2
        t0 = time.time()
        for _ in range(reps):
            r = chained(tb, tb2)
        float(np.asarray(r))
        dt = (time.time() - t0) / (reps * chain)
        best_mbps = max(best_mbps, 2 * tbs * batch / dt / 1e6)
    return round(best_mbps, 0)


def main():
    """Receivers FIRST (each with its own remaining-budget guard), the
    turbo headline LAST and unconditionally — so a slow cold compile of any
    one phase can no longer starve the others (round-2 capture lost all
    three rx numbers to one 480 s pre-receiver cliff).  Partial results are
    checkpointed to .bench_partial.json after every phase so a hard kill
    still leaves the completed numbers on disk."""
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", 1500))
    out = {"platform": jax.devices()[0].platform}
    partial = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_partial.json")

    def attempt(fn_call, budget_frac):
        """Run a phase with ONE retry on exception: the remote compile
        service intermittently drops a request mid-body (HTTP 500 /
        truncated read), which is transient — a retry hits the warm
        persistent cache. Retries only inside the remaining budget."""
        try:
            return fn_call()
        except Exception:
            if time.time() - t_start > budget * budget_frac:
                raise
            return fn_call()

    def checkpoint():
        # progressive capture: print the cumulative JSON after every
        # phase (the driver reads the LAST stdout line, so a hard kill
        # mid-run still leaves the latest completed phases on record)
        # and mirror it to .bench_partial.json
        print(json.dumps(out), flush=True)
        try:
            with open(partial, "w") as f:
                f.write(json.dumps(out) + "\n")
        except OSError:
            pass

    # a cold rx compile measures ~2-3 min; leave headroom for the turbo
    # phase (always runs) before the overall budget
    rx_guards = {"20mimo": 0.45, "10siso": 0.6, "20ul": 0.75}
    if not os.environ.get("BENCH_QUICK"):
        for config in ("20mimo", "10siso", "20ul"):
            if time.time() - t_start > budget * rx_guards[config]:
                out[f"rx_{config}"] = "skipped (time budget)"
                continue
            t0 = time.time()
            try:
                rx_mbps, sfps, ok, n_it, _bler = attempt(
                    lambda: bench_receiver(config), rx_guards[config])
                out[f"rx_{config}_mbps"] = rx_mbps
                out[f"rx_{config}_sfps"] = sfps
                out[f"rx_{config}_ok"] = ok
                out[f"rx_{config}_iters"] = n_it
                out[f"rx_{config}_vs_baseline"] = round(
                    rx_mbps / RX_BASELINE[config], 1)
            except Exception as e:  # never lose the remaining metrics
                out[f"rx_{config}"] = f"failed: {e}"[:120]
            out[f"t_rx_{config}_s"] = round(time.time() - t0, 1)
            checkpoint()
        # mid-SNR operating points (waterfall edge: the early stop
        # actually iterates; BLER + iteration depth captured, config 2/3/4
        # analog of phy_dl_test.c:371-408 operating-SNR sweeps)
        for config in ("20mimo", "10siso", "20ul"):
            if time.time() - t_start > budget * 0.8:
                out[f"rx_{config}_mid"] = "skipped (time budget)"
                continue
            t0 = time.time()
            try:
                rx_mbps, sfps, _ok, n_it, bler = attempt(
                    lambda: bench_receiver(config, midsnr=True), 0.82)
                out[f"rx_{config}_mid_mbps"] = rx_mbps
                out[f"rx_{config}_mid_bler"] = bler
                out[f"rx_{config}_mid_iters"] = n_it
            except Exception as e:
                out[f"rx_{config}_mid"] = f"failed: {e}"[:120]
            out[f"t_rx_{config}_mid_s"] = round(time.time() - t0, 1)
            checkpoint()

        # full-chain UE DL (no genie channel: FFT + LS chest + PCFICH +
        # blind PDCCH + PDSCH; SISO and the reference's 20 MHz MIMO
        # headline configuration) and the eNB TX side
        uedl_phases = (("rx_uedl", dict(), 36.0),
                       ("rx_uedl_20mimo", dict(mimo=True), 150.0))
        for name, kw, base in uedl_phases:
            if time.time() - t_start > budget * 0.85:
                out[name] = "skipped (time budget)"
                continue
            t0 = time.time()
            try:
                mbps_x, sfps, okx, n_it = attempt(
                    lambda: bench_uedl(**kw), 0.88)
                out[f"{name}_mbps"] = mbps_x
                out[f"{name}_sfps"] = sfps
                out[f"{name}_ok"] = okx
                out[f"{name}_iters"] = n_it
                out[f"{name}_vs_baseline"] = round(mbps_x / base, 1)
            except Exception as e:
                out[name] = f"failed: {e}"[:120]
            out[f"t_{name}_s"] = round(time.time() - t0, 1)
            checkpoint()
        if time.time() - t_start < budget * 0.9:
            t0 = time.time()
            try:
                out["tx_20mimo_mbps"] = attempt(bench_tx, 0.93)
                out["tx_20mimo_vs_baseline"] = round(
                    out["tx_20mimo_mbps"] / 150.0, 1)
            except Exception as e:
                out["tx_20mimo"] = f"failed: {e}"[:120]
            out["t_tx_20mimo_s"] = round(time.time() - t0, 1)
            checkpoint()
        # real-time latency point (4 ms HARQ deadline comparison)
        if time.time() - t_start < budget * 0.92:
            t0 = time.time()
            try:
                out.update(attempt(bench_latency, 0.95))
            except Exception as e:
                out["uedl_latency"] = f"failed: {e}"[:120]
            out["t_latency_s"] = round(time.time() - t0, 1)
            checkpoint()

    t0 = time.time()
    mbps, errs, batch = bench_turbo()
    out.update({
        "metric": "turbo_decode_throughput_k6144_5it",
        "value": mbps,
        "unit": "Mbps",
        "vs_baseline": round(mbps / BASELINE_MBPS, 2),
        "bit_errors": errs,
        "batch": batch,
        "t_turbo_s": round(time.time() - t0, 1),
        "t_total_s": round(time.time() - t_start, 1),
    })
    checkpoint()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
