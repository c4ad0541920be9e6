"""EPC components: HSS and SP-GW (srsepc/ parity, host-side).

The reference's srsEPC bundles MME, HSS, SP-GW and MBMS-GW in one binary
(srsepc/src/main.cc). Here the data-plane and authentication pieces are
provided: HSS with a CSV subscriber database and Milenage/XOR EPS
authentication vectors (srsepc/src/hss/hss.cc:808), and an SP-GW with
TEID allocation and GTP-U tunnel forwarding (srsepc/src/spgw/spgw.cc).
The MME's S1AP/NAS signalling codecs are future work (they are pure
message packing over these primitives).
"""

from .hss import Hss, Subscriber
from .spgw import SpGw

__all__ = ["Hss", "Subscriber", "SpGw"]
from .mbms_gw import MbmsGw, m1_ingest  # noqa: F401,E402
