"""HARQ entities and processes (srsenb/src/mac/scheduler_harq.cc,
srsue/src/mac/dl_harq.cc parity).

8 stop-and-wait processes per direction; DL retransmissions cycle the
redundancy version 0 -> 2 -> 3 -> 1 (the standard rv_idx sequence) and the
PHY's per-CB softbuffers (models/sch.py) carry the combined LLRs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

NOF_HARQ_PROC = 8
#: rv sequence for retransmissions (36.213 7.1.7.1 convention).
RV_SEQ = (0, 2, 3, 1)
MAX_RETX = 4


@dataclass
class DlHarqProcess:
    pid: int
    active: bool = False
    ndi: int = 0
    n_tx: int = 0
    tbs: int = 0
    mcs: int = 0
    softbuffers: object = None     # per-CB device arrays, models/sch.py

    @property
    def rv(self) -> int:
        return RV_SEQ[(self.n_tx - 1) % 4] if self.n_tx else 0

    def new_tx(self, tbs: int, mcs: int) -> None:
        self.active = True
        self.ndi ^= 1
        self.n_tx = 1
        self.tbs = tbs
        self.mcs = mcs
        self.softbuffers = None

    def retx(self) -> None:
        assert self.active
        self.n_tx += 1

    def ack(self, ok: bool) -> bool:
        """Process feedback; returns True if a retransmission is needed."""
        if ok or self.n_tx >= MAX_RETX:
            self.active = False
            self.softbuffers = None
            return False
        return True


@dataclass
class DlHarqEntity:
    processes: list = field(
        default_factory=lambda: [DlHarqProcess(i) for i in range(NOF_HARQ_PROC)])

    def get_empty(self) -> DlHarqProcess | None:
        for p in self.processes:
            if not p.active:
                return p
        return None

    def pending_retx(self) -> DlHarqProcess | None:
        for p in self.processes:
            if p.active and p.n_tx > 0 and getattr(p, "_needs_retx", False):
                return p
        return None

    def feedback(self, pid: int, ok: bool) -> None:
        p = self.processes[pid]
        p._needs_retx = p.ack(ok)
