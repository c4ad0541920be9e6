#!/usr/bin/env python
"""IQ capture to file through the RF HAL (lib/examples/usrp_capture.c
analog): open a device (auto-probe or named, rf_imp.c:103-126 parity),
tune, set gain/rate, stream N subframes into a binary capture that
FileSource / the reference's filesource can read back.

Usage:
  python apps/iq_capture.py -o /tmp/cap.bin -n 100 \
      -d file -a rx=/tmp/enb.bin           # any registered HAL device
  python apps/iq_capture.py -o /tmp/cap.bin -d net -a rx_port=2001
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from empower_srslte_tpu.runtime.io import FileSink
from empower_srslte_tpu.runtime.logging import get_logger
from empower_srslte_tpu.runtime.rf import rf_open
from empower_srslte_tpu.utils.cell import Cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-n", "--subframes", type=int, default=100)
    ap.add_argument("-p", "--nof-prb", type=int, default=25,
                    help="sets the sample rate from the cell bandwidth")
    ap.add_argument("-f", "--freq", type=float, default=2.68e9)
    ap.add_argument("-g", "--gain", type=float, default=50.0)
    ap.add_argument("-d", "--device", default=None,
                    help="HAL device name (default: auto-probe)")
    ap.add_argument("-a", "--args", default="", help="device args")
    args = ap.parse_args()

    log = get_logger("CAPT", "info")
    cell = Cell(nof_prb=args.nof_prb, id=0)
    srate = cell.sf_sample_len * 1000.0

    dev = rf_open(args.device, args.args)
    log.info("opened RF device '%s'", dev.name)
    dev.set_rx_srate(srate)
    dev.set_rx_gain(args.gain)
    dev.set_rx_freq(args.freq)
    dev.start_rx_stream()

    first_ts = None
    with FileSink(args.output) as sink:
        for i in range(args.subframes):
            samples, ts = dev.recv_with_time(cell.sf_sample_len)
            if first_ts is None:
                first_ts = ts
            sink.write(samples)
    dev.stop_rx_stream()
    dev.close()
    log.info("wrote %d subframes (%.2f Msps, first ts %s) to %s",
             args.subframes, srate / 1e6, first_ts, args.output)


if __name__ == "__main__":
    main()
