"""MAC downlink/uplink scheduler (srsenb/src/mac/scheduler.cc parity).

The ``Scheduler`` produces per-TTI grant lists (sched::dl_sched /
ul_sched, scheduler.h:128-129) through a pluggable metric interface
(scheduler.h:61-75); ``RrMetric`` is the reference's time-domain
round-robin RBG allocator (dl_metric_rr::new_tti,
scheduler_metric.cc:79). Per-UE state tracks CQI -> MCS and buffer
status (scheduler_ue.cc), HARQ via mac/harq.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..models import ra
from .harq import DlHarqEntity

#: CQI index -> highest I_MCS whose spectral efficiency fits (36.213-ish
#: conservative mapping, mirroring the reference's cqi_to_mcs behavior).
CQI_TO_MCS = (0, 0, 2, 4, 6, 8, 11, 13, 15, 18, 20, 22, 24, 26, 28, 28)


@dataclass
class UeState:
    rnti: int
    cqi: int = 7
    buffer_bytes: int = 0
    harq: DlHarqEntity = field(default_factory=DlHarqEntity)
    slice_id: int = 0

    def max_mcs(self) -> int:
        return CQI_TO_MCS[min(self.cqi, 15)]


@dataclass
class DlGrant:
    rnti: int
    rbg_bitmap: int
    n_prb: int
    mcs: int
    tbs: int
    harq_pid: int
    rv: int = 0
    ndi: int = 0


class RrMetric:
    """Round-robin RBG allocation across UEs with data
    (dl_metric_rr analog)."""

    def __init__(self):
        self._next = 0

    def new_tti(self, ues: list[UeState], n_rbg: int, tti: int):
        """Returns {rnti: rbg_bitmap} covering all RBGs round-robin."""
        active = [u for u in ues if u.buffer_bytes > 0]
        if not active:
            return {}
        alloc: dict[int, int] = {u.rnti: 0 for u in active}
        start = self._next % len(active)
        per = max(1, n_rbg // len(active))
        g = 0
        order = active[start:] + active[:start]
        for u in order:
            take = min(per, n_rbg - g)
            for i in range(take):
                alloc[u.rnti] |= 1 << (n_rbg - 1 - (g + i))
            g += take
            if g >= n_rbg:
                break
        # leftover RBGs to the first UE in order
        while g < n_rbg:
            alloc[order[0].rnti] |= 1 << (n_rbg - 1 - g)
            g += 1
        self._next += 1
        return {r: b for r, b in alloc.items() if b}


class Scheduler:
    """Grant production for one cell (sched class analog)."""

    def __init__(self, nof_prb: int, metric=None, max_mcs: int = 28):
        self.nof_prb = nof_prb
        self.p = ra.rbg_size(nof_prb)
        self.n_rbg = math.ceil(nof_prb / self.p)
        self.metric = metric or RrMetric()
        self.max_mcs = max_mcs
        self.ues: dict[int, UeState] = {}

    def add_ue(self, rnti: int, **kw) -> UeState:
        ue = UeState(rnti=rnti, **kw)
        self.ues[rnti] = ue
        return ue

    def rem_ue(self, rnti: int) -> None:
        self.ues.pop(rnti, None)

    def dl_buffer_state(self, rnti: int, nof_bytes: int) -> None:
        self.ues[rnti].buffer_bytes = nof_bytes

    def cqi_info(self, rnti: int, cqi: int) -> None:
        self.ues[rnti].cqi = cqi

    def dl_sched(self, tti: int) -> list[DlGrant]:
        """One TTI of downlink grants (sched::dl_sched analog)."""
        alloc = self.metric.new_tti(list(self.ues.values()), self.n_rbg, tti)
        grants = []
        for rnti, bitmap in alloc.items():
            ue = self.ues[rnti]
            mask = ra.prb_mask_type0(self.nof_prb, bitmap)
            n_prb = sum(mask)
            if n_prb == 0:
                continue
            proc = ue.harq.pending_retx()
            if proc is not None:
                proc.retx()
                proc._needs_retx = False
                grants.append(DlGrant(rnti, bitmap, n_prb, proc.mcs,
                                      proc.tbs, proc.pid, proc.rv, proc.ndi))
                continue
            proc = ue.harq.get_empty()
            if proc is None:
                continue
            mcs = min(ue.max_mcs(), self.max_mcs)
            _, tbs = ra.mcs_to_tbs(mcs, n_prb)
            # shrink MCS until the TB fits the buffer reasonably
            while mcs > 0 and tbs // 8 > max(ue.buffer_bytes, 1) * 2:
                mcs -= 1
                _, tbs = ra.mcs_to_tbs(mcs, n_prb)
            proc.new_tx(tbs, mcs)
            ue.buffer_bytes = max(0, ue.buffer_bytes - tbs // 8)
            grants.append(DlGrant(rnti, bitmap, n_prb, mcs, tbs, proc.pid,
                                  0, proc.ndi))
        return grants

    def harq_feedback(self, rnti: int, pid: int, ok: bool) -> None:
        self.ues[rnti].harq.feedback(pid, ok)
