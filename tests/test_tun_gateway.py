"""Kernel-path user plane: real TUN interfaces + network namespace.

The reference's deployment shape (srsue gw.cc TUN on one box, srsepc
spgw SGi TUN on another) emulated on one host: the UE TUN lives in a
network namespace, so a real UDP socket in that namespace reaches a real
UDP socket on the host ONLY by traversing the full stack —
kernel -> TUN -> PDCP/RLC/MAC -> PUSCH IQ -> eNB -> GTP-U -> SP-GW ->
SGi TUN -> kernel, and back.

Skipped when the container lacks CAP_NET_ADMIN.
"""

import subprocess
import sys

import pytest

from empower_srslte_tpu.runtime.tun import (NetNs, SgiGateway, TunDevice,
                                            UeGateway, tun_available)


def _netns_available() -> bool:
    try:
        subprocess.run(["ip", "netns", "add", "_probe_ns"], check=True,
                       capture_output=True)
        subprocess.run(["ip", "netns", "del", "_probe_ns"],
                       capture_output=True)
        return True
    except Exception:
        return False


requires_netadmin = pytest.mark.skipif(
    not (tun_available() and _netns_available()),
    reason="needs CAP_NET_ADMIN (tun + netns)")

CLIENT = r"""
import socket, sys
s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
s.settimeout(600)
s.bind(("{ue_ip}", 9000))
s.sendto(b"PING-VIA-TUN", ("10.0.100.1", 9999))
data, addr = s.recvfrom(2048)
print("GOT:" + data.decode(), flush=True)
"""


@requires_netadmin
class TestTunUserPlane:
    def test_udp_round_trip_through_the_stack(self):
        from tests.test_stack import _epc

        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)

        # 1) attach over the air (in-memory IQ)
        ul_iq = None
        tti = 0
        while not (ue.rrc.nas.attached and ue.rrc.drbs) and tti < 100:
            dl_iq = enb.tti(tti, air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            tti += 1
        assert ue.rrc.nas.attached, "attach failed"
        ue_ip = ue.rrc.nas.ue_ip

        ns = ue_tun = sgi_tun = client = None
        try:
            # 2) TUN endpoints: UE side in a namespace, SGi on the host
            ns = NetNs("lteue0")
            ue_tun = TunDevice("tun_srsue", netns=ns.name)
            ue_tun.set_ip(f"{ue_ip}/24")
            ue_tun.add_route("default")
            sgi_tun = TunDevice("srs_spgw_sgi", ip_cidr="10.0.100.1/24")
            sgi_tun.add_route(f"{ue_ip}/32")

            gw = UeGateway(ue, ue_tun)
            sgi = SgiGateway(mme.spgw, enb, sgi_tun)

            # 3) real sockets: server on the host SGi address, client in
            # the UE namespace
            import socket as pysock
            server = pysock.socket(pysock.AF_INET, pysock.SOCK_DGRAM)
            server.bind(("10.0.100.1", 9999))
            server.settimeout(0.0)
            server.setblocking(False)

            client = ns.popen(
                [sys.executable, "-c", CLIENT.format(ue_ip=ue_ip)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)

            # 4) TTI loop pumping both gateways
            got_ping = False
            for _ in range(600):
                dl_iq = enb.tti(
                    tti, air.ul(ul_iq) if ul_iq is not None else None)
                ul_iq = ue.tti(tti, air.dl(dl_iq))
                tti += 1
                gw.pump()
                sgi.pump()
                if not got_ping:
                    try:
                        data, addr = server.recvfrom(2048)
                        assert data == b"PING-VIA-TUN"
                        assert addr[0] == ue_ip
                        server.sendto(b"PONG-VIA-TUN", addr)
                        got_ping = True
                    except BlockingIOError:
                        pass
                if client.poll() is not None:
                    break
            assert got_ping, "uplink packet never reached the SGi socket"
            out, err = client.communicate(timeout=10)
            assert "GOT:PONG-VIA-TUN" in out, (out, err)
        finally:
            if client is not None and client.poll() is None:
                client.kill()
            for dev in (ue_tun, sgi_tun):
                if dev is not None:
                    dev.close()
            if ns is not None:
                ns.close()
