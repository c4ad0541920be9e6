"""DL-SCH / UL-SCH transport-channel processing (36.212 5.3.2).

Capability parity with lib/src/phy/phch/sch.c: TB encode (CRC24A attach ->
segmentation -> per-CB CRC24B -> turbo encode -> rate matching ->
concatenation, sch.c:188-298) and decode_tb_cb (per-CB de-rate-matching
with HARQ soft combining -> iterative turbo decode with CRC check ->
reassembly -> TB CRC, sch.c:307-422).

TPU-native design: a frozen ``DlschPlan`` captures every static dimension
(segmentation, per-CB K/E/F, RV) so the whole TB decode is one compiled
program; code blocks are decoded as a flattened [batch*C] turbo batch per
K-group (the reference decodes CBs serially with per-CB early stop; here
the early stop is the batched CRC-select in the decoder driver).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp

from ..ops.fec.cbsegm import CbSegm, cbsegm
from ..ops.fec.rate_matching import RateMatchTurbo
from ..ops.fec.turbo_decoder import TurboDecoder
from ..ops.fec.turbo_encoder import turbo_encode_fast as turbo_encode
from ..utils.crc import CRC24A, CRC24B


def _cb_e_sizes(g: int, c: int, qm: int, n_layers: int) -> tuple[int, ...]:
    """Per-CB rate-matching output size E (36.212 5.1.4.1.2)."""
    g_prime = g // (qm * n_layers)
    gamma = g_prime % c
    e_minus = qm * n_layers * (g_prime // c)
    e_plus = qm * n_layers * (-(-g_prime // c))
    return tuple(e_minus if i < c - gamma else e_plus for i in range(c))


def _pick_window(k: int) -> int | None:
    """Window length for the parallel turbo decoder: the divisor of K
    closest to 256 that is a multiple of 16 (the NII kernel's row-group
    granularity) and >= 48 (the v1 path trains over a 40-step overlap).
    Fewer, larger windows amortize the per-window program overheads of
    the Pallas grid; None = full sweeps."""
    best = None
    for w in range(48, min(k, 769), 16):
        if k % w == 0 and (best is None or
                           abs(w - 256) < abs(best - 256)):
            best = w
    return best


@dataclass(frozen=True)
class DlschPlan:
    """Static per-grant transport channel plan (keys compiled pipelines)."""

    tbs: int                 # transport block payload bits
    g: int                   # total codeword bits after rate matching
    qm: int                  # modulation order (bits/symbol)
    rv: int = 0              # redundancy version
    n_layers: int = 1        # layers carrying this codeword
    max_iterations: int = 5
    decoder_impl: str = "auto"
    #: iterate only until every CB passes its CRC (sch.c:382 early stop,
    #: batched) — the reference's default behavior; False = fixed
    #: max_iterations (benchmarking at a fixed operating point)
    early_stop: bool = True

    @functools.cached_property
    def segm(self) -> CbSegm:
        return cbsegm(self.tbs)

    @functools.cached_property
    def e_sizes(self) -> tuple[int, ...]:
        return _cb_e_sizes(self.g, self.segm.c, self.qm, self.n_layers)

    @functools.cached_property
    def cb_plans(self):
        """Per-CB (k, e, f, offset_in_codeword)."""
        out = []
        off = 0
        for i, (k, e) in enumerate(zip(self.segm.cb_sizes, self.e_sizes)):
            f = self.segm.f if i == 0 else 0
            out.append((k, e, f, off))
            off += e
        assert off == self.g, (off, self.g)
        return tuple(out)

    def rm(self, k: int, f: int) -> RateMatchTurbo:
        return RateMatchTurbo(k, f=f)

    def decoder(self, k: int) -> TurboDecoder:
        return TurboDecoder(k=k, iterations=self.max_iterations,
                            window=_pick_window(k), impl=self.decoder_impl)


def dlsch_encode(tb_bits, plan: DlschPlan):
    """Encode tb_bits[..., tbs] -> codeword bits [..., G] (int8).

    Mirrors encode_tb_off (sch.c:188-298). jit-compatible; all sizes are
    static from the plan. The TB CRC is computed on device via the parity
    matrix (utils/crc.py).
    """
    segm = plan.segm
    lead = tb_bits.shape[:-1]

    # TB CRC24A
    tb_crc = CRC24A.jnp_compute(tb_bits).astype(jnp.int8)
    full = jnp.concatenate([tb_bits.astype(jnp.int8), tb_crc], axis=-1)

    # segmentation: K- blocks first, filler zeros lead the first block
    pieces = []
    pos = 0
    for i, k in enumerate(segm.cb_sizes):
        f = segm.f if i == 0 else 0
        payload = k - f - (24 if segm.c > 1 else 0)
        cb = full[..., pos : pos + payload]
        pos += payload
        if segm.c > 1:
            cb_crc = CRC24B.jnp_compute(
                jnp.concatenate(
                    [jnp.zeros((*lead, f), jnp.int8), cb], axis=-1)
                if f else cb).astype(jnp.int8)
            cb = jnp.concatenate([cb, cb_crc], axis=-1)
        if f:
            cb = jnp.concatenate([jnp.zeros((*lead, f), jnp.int8), cb], axis=-1)
        pieces.append(cb)
    assert pos == plan.tbs + 24

    # turbo encode + rate match per CB
    out = []
    for (k, e, f, _), cb in zip(plan.cb_plans, pieces):
        d = turbo_encode(cb)                     # [..., 3, K+4]
        out.append(plan.rm(k, f).tx(d, plan.rv, e))
    return jnp.concatenate(out, axis=-1)


def dlsch_decode(llrs, plan: DlschPlan, softbuffers=None):
    """Decode llrs[..., G] -> (tb_bits[..., tbs], crc_ok[...], softbuffers).

    Mirrors decode_tb / decode_tb_cb (sch.c:307-437): per-CB de-rate-match
    with HARQ combining into ``softbuffers`` (list of per-CB arrays or
    None), batched turbo decode, CB CRC checks, reassembly, TB CRC.
    """
    segm = plan.segm
    stop_crc = (CRC24B if segm.c > 1 else CRC24A) if plan.early_stop else None

    # Group code blocks by (K, E, F) for de-rate-matching, then merge
    # same-K groups into ONE batched turbo decode — the reference decodes
    # CBs serially (sch.c:307-422); stacking them multiplies the kernel
    # batch, and merging across E/F variants (the first CB's filler, the
    # +Qm last-CB rate-match size) avoids a second, mostly-padding kernel
    # launch for the odd CB out.
    groups: dict = {}
    for idx, (k, e, f, off) in enumerate(plan.cb_plans):
        groups.setdefault((k, e, f), []).append((idx, off))

    derm: dict = {}
    for (k, e, f), members in groups.items():
        seg = jnp.stack([llrs[..., off : off + e] for _, off in members],
                        axis=-2)                       # [..., n_cb, E]
        sb = (jnp.stack([softbuffers[idx] for idx, _ in members], axis=-2)
              if softbuffers is not None else None)
        d_llr, ns = plan.rm(k, f).rx(seg, plan.rv, softbuffer=sb)
        derm.setdefault(k, []).append((f, members, d_llr, ns))

    new_soft = [None] * segm.c
    cb_bits = [None] * segm.c
    cb_ok = [None] * segm.c
    for k, items in derm.items():
        d_all = (jnp.concatenate([d for _f, _m, d, _n in items], axis=-3)
                 if len(items) > 1 else items[0][2])
        bits, _ = plan.decoder(k).decode(d_all, crc=stop_crc)
        slot = 0
        for f, members, _d, ns in items:
            for j, (idx, _off) in enumerate(members):
                new_soft[idx] = ns[..., j, :]
                b = bits[..., slot, :]
                slot += 1
                if segm.c > 1:
                    cb_ok[idx] = CRC24B.jnp_check(b)
                    cb_bits[idx] = b[..., f : k - 24]
                else:
                    cb_bits[idx] = b[..., f:]
    cb_ok = [ok for ok in cb_ok if ok is not None]

    full = jnp.concatenate(cb_bits, axis=-1)     # [..., tbs + 24]
    tb_ok = CRC24A.jnp_check(full)
    # the all-zero word is a valid turbo codeword whose CRC trivially
    # passes; a decoder collapsing to it (e.g. wrong descrambling) must
    # not report success
    tb_ok = jnp.logical_and(tb_ok, jnp.any(full != 0, axis=-1))
    if cb_ok:
        all_cb = cb_ok[0]
        for ok in cb_ok[1:]:
            all_cb = jnp.logical_and(all_cb, ok)
        tb_ok = jnp.logical_and(tb_ok, all_cb)
    return full[..., : plan.tbs], tb_ok, new_soft
