"""Foundations: cell configuration, Gold sequences, CRC, bit manipulation.

TPU-native counterpart of the reference's lib/src/phy/common and
lib/src/phy/utils layers (lib/src/phy/common/phy_common.c,
lib/src/phy/common/sequence.c, lib/src/phy/fec/crc.c,
lib/src/phy/utils/bit.c) — re-designed as precomputed numpy tables plus
vectorized jnp transforms, not a port of the C implementations.
"""

from .cell import CP, Cell, SF_RE_LEN, sf_sample_len, symbol_sz
from .sequence import gold_sequence, gold_state
from .crc import Crc, CRC24A, CRC24B, CRC16, CRC8
from . import bits

__all__ = [
    "CP",
    "Cell",
    "SF_RE_LEN",
    "sf_sample_len",
    "symbol_sz",
    "gold_sequence",
    "gold_state",
    "Crc",
    "CRC24A",
    "CRC24B",
    "CRC16",
    "CRC8",
    "bits",
]
