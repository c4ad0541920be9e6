"""RRC ASN.1 codec tests (36.331 UPER; liblte_rrc.cc parity).

Goldens are the captured messages asserted by the reference's own tests:
lib/test/asn1/srslte_asn1_rrc_meas_test.cc (18-byte MeasurementReport) and
srsue/test/upper/rrc_reconfig_test.cc (147-byte RRCConnectionReconfiguration
from a live eNB, including measConfig, a 73-byte piggybacked NAS PDU,
SRB/DRB setup, MAC/DRX/PHY dedicated config and v890 extensions).
"""

import numpy as np
import pytest

from empower_srslte_tpu.rrc import messages as M
from empower_srslte_tpu.rrc.per import BitReader, BitWriter

MEAS_GOLDEN = bytes([
    0x08, 0x10, 0x49, 0x3C, 0x0D, 0x97, 0x89, 0x83, 0xC0, 0x84, 0x20, 0x82,
    0x08, 0x21, 0x00, 0x01, 0xBC, 0x48])

RECONF_GOLDEN = bytes([
    0x22, 0x16, 0x95, 0xa0, 0x18, 0x00, 0x05, 0xaa, 0x50, 0x36, 0x00, 0x61,
    0x08, 0x9c, 0xe3, 0x40, 0xb0, 0x84, 0x4e, 0x71, 0xc0, 0x30, 0x84, 0x6e,
    0x71, 0xe0, 0x70, 0x84, 0x6e, 0x70, 0x6c, 0x63, 0x1a, 0xc6, 0xb9, 0x8e,
    0x7b, 0x1e, 0x84, 0xc0, 0x01, 0x24, 0x9d, 0x3e, 0xaf, 0xbd, 0x64, 0x04,
    0x1d, 0x08, 0x05, 0x24, 0x19, 0x00, 0x03, 0xc4, 0x40, 0xc4, 0xc8, 0x00,
    0x89, 0x48, 0x07, 0x04, 0x14, 0x1f, 0xff, 0xff, 0xff, 0xfc, 0x30, 0x2d,
    0xd9, 0xe9, 0xdd, 0xa5, 0xb9, 0xd1, 0x95, 0xc9, 0xb9, 0x95, 0xd0, 0x14,
    0x04, 0x38, 0x38, 0x38, 0x05, 0x78, 0x13, 0xfb, 0xfa, 0x05, 0x39, 0x40,
    0x2f, 0xd8, 0x03, 0xc4, 0x40, 0x00, 0x08, 0x04, 0x04, 0x00, 0x01, 0x88,
    0x5c, 0xb1, 0x65, 0x25, 0x90, 0x04, 0x0d, 0xa9, 0xc0, 0x2a, 0x9a, 0x01,
    0x99, 0x3b, 0x01, 0xf5, 0x12, 0xf0, 0x85, 0x0d, 0x85, 0xef, 0xc0, 0x01,
    0xf2, 0x20, 0x60, 0x18, 0x07, 0x97, 0x09, 0x1f, 0xc3, 0x06, 0x00, 0x81,
    0x00, 0x00, 0x11])


class TestGoldens:
    def test_measurement_report_decode(self):
        name, v = M.unpack_ul_dcch(MEAS_GOLDEN)
        assert name == "measurementReport"
        r8 = v["critical_extensions"][1][1]
        mr = r8["meas_results"]
        # same assertions as srslte_asn1_rrc_meas_test.cc:53-76
        assert mr["meas_id"] == 1
        assert mr["meas_result_pcell"]["rsrp_result"] == 73
        assert mr["meas_result_pcell"]["rsrq_result"] == 15
        kind, cells = mr["meas_result_neigh_cells"]
        assert kind == "measResultListEUTRA" and len(cells) == 1
        c = cells[0]
        assert c["phys_cell_id"] == 357
        cgi = c["cgi_info"]
        assert cgi["cell_global_id"]["plmn_identity"]["mcc"] == [8, 9, 8]
        assert cgi["cell_global_id"]["plmn_identity"]["mnc"] == [7, 8]
        assert cgi["cell_global_id"]["cell_identity"] == 0x1084104
        assert cgi["tracking_area_code"] == 0x1042
        assert len(cgi["plmn_identity_list"]) == 1
        assert c["meas_result"]["rsrp_result"] == 60
        assert c["meas_result"]["rsrq_result"] == 18

    def test_measurement_report_repack_bit_exact(self):
        r = BitReader(MEAS_GOLDEN)
        v = M.UL_DCCH_Message.unpack(r)
        w = BitWriter()
        M.UL_DCCH_Message.pack(w, v)
        assert w.to_bytes() == MEAS_GOLDEN

    def test_reconfiguration_decode(self):
        name, v = M.unpack_dl_dcch(RECONF_GOLDEN)
        assert name == "rrcConnectionReconfiguration"
        assert v["rrc_transaction_identifier"] == 1
        r8 = v["critical_extensions"][1][1]
        mc = r8["meas_config"]
        assert len(mc["meas_object_to_add_mod_list"]) == 1
        assert len(mc["report_config_to_add_mod_list"]) == 4
        assert len(mc["meas_id_to_add_mod_list"]) == 4
        obj = mc["meas_object_to_add_mod_list"][0]["meas_object"][1]
        assert obj["carrier_freq"] == 2900
        # a 73-byte NAS PDU rides along (the attach-accept of nas_test)
        assert [len(x) for x in r8["dedicated_info_nas_list"]] == [73]
        assert r8["dedicated_info_nas_list"][0][0] == 0x27  # NAS sec hdr
        rrd = r8["radio_resource_config_dedicated"]
        assert len(rrd["srb_to_add_mod_list"]) == 1
        assert rrd["srb_to_add_mod_list"][0]["srb_identity"] == 2
        assert len(rrd["drb_to_add_mod_list"]) == 1
        assert rrd["mac_main_config"][0] == "explicitValue"
        assert rrd["physical_config_dedicated"] is not None

    def test_reconfiguration_repack_bit_exact(self):
        r = BitReader(RECONF_GOLDEN)
        v = M.DL_DCCH_Message.unpack(r)
        assert r.remaining == 0
        w = BitWriter()
        M.DL_DCCH_Message.pack(w, v)
        assert w.to_bytes() == RECONF_GOLDEN


class TestRoundTrips:
    def test_connection_request(self):
        msg = {"critical_extensions": ("r8", {
            "ue_identity": ("randomValue", 0x1234567890),
            "establishment_cause": "mo_Signalling", "spare": 0})}
        b = M.pack_ul_ccch("rrcConnectionRequest", msg)
        assert len(b) == 6   # fixed 44-bit payload + padding
        name, v = M.unpack_ul_ccch(b)
        assert name == "rrcConnectionRequest"
        assert v["critical_extensions"][1]["ue_identity"][1] == 0x1234567890

    def test_connection_setup_with_srb1(self):
        srb1 = {"srb_identity": 1,
                "rlc_config": ("explicitValue", ("am", {
                    "ul_am_rlc": {"t_poll_retransmit": 10, "poll_pdu": 0,
                                  "poll_byte": 14, "max_retx_threshold": 3},
                    "dl_am_rlc": {"t_reordering": 7,
                                  "t_status_prohibit": 0}})),
                "logical_channel_config": ("defaultValue", None)}
        msg = {"rrc_transaction_identifier": 0,
               "critical_extensions": ("c1", ("r8", {
                   "radio_resource_config_dedicated": {
                       "srb_to_add_mod_list": [srb1]}}))}
        b = M.pack_dl_ccch("rrcConnectionSetup", msg)
        name, v = M.unpack_dl_ccch(b)
        assert name == "rrcConnectionSetup"
        got = v["critical_extensions"][1][1][
            "radio_resource_config_dedicated"]["srb_to_add_mod_list"][0]
        assert got["rlc_config"][1][1]["ul_am_rlc"]["poll_byte"] == 14

    def test_setup_complete_and_nas_transfer(self):
        nas = bytes(range(40))
        msg = {"rrc_transaction_identifier": 1,
               "critical_extensions": ("c1", ("r8", {
                   "selected_plmn_identity": 1,
                   "registered_mme": {"mmegi": 0x8001, "mmec": 0x1A},
                   "dedicated_info_nas": nas}))}
        b = M.pack_ul_dcch("rrcConnectionSetupComplete", msg)
        name, v = M.unpack_ul_dcch(b)
        assert name == "rrcConnectionSetupComplete"
        assert v["critical_extensions"][1][1]["dedicated_info_nas"] == nas

        ul = {"critical_extensions": ("c1", ("r8", {
            "dedicated_info_type": ("dedicatedInfoNAS", nas)}))}
        b2 = M.pack_ul_dcch("ulInformationTransfer", ul)
        name2, v2 = M.unpack_ul_dcch(b2)
        assert v2["critical_extensions"][1][1]["dedicated_info_type"][1] \
            == nas

    def test_security_mode_command(self):
        msg = {"rrc_transaction_identifier": 2,
               "critical_extensions": ("c1", ("r8", {
                   "security_config_smc": {"security_algorithm_config": {
                       "ciphering_algorithm": "eea1",
                       "integrity_prot_algorithm": "eia2"}}}))}
        b = M.pack_dl_dcch("securityModeCommand", msg)
        name, v = M.unpack_dl_dcch(b)
        alg = v["critical_extensions"][1][1]["security_config_smc"][
            "security_algorithm_config"]
        assert (alg["ciphering_algorithm"], alg["integrity_prot_algorithm"]) \
            == ("eea1", "eia2")

    def test_reconfiguration_with_mobility(self):
        mci = {"target_pci": 301, "t304": 4, "new_ue_identity": 0x4602,
               "radio_resource_config_common": {
                   "prach_config": {"root_sequence_index": 200},
                   "pusch_config_common": {
                       "pusch_config_basic": {
                           "n_sb": 1, "hopping_mode": 0,
                           "pusch_hopping_offset": 2, "enable_64qam": False},
                       "ul_reference_signals_pusch": {
                           "group_hopping_enabled": False,
                           "group_assignment_pusch": 0,
                           "sequence_hopping_enabled": False,
                           "cyclic_shift": 0}},
                   "ul_cyclic_prefix_length": 0},
               "rach_config_dedicated": {"ra_preamble_index": 7,
                                         "ra_prach_mask_index": 0}}
        msg = {"rrc_transaction_identifier": 3,
               "critical_extensions": ("c1", ("r8", {
                   "mobility_control_info": mci}))}
        b = M.pack_dl_dcch("rrcConnectionReconfiguration", msg)
        name, v = M.unpack_dl_dcch(b)
        got = v["critical_extensions"][1][1]["mobility_control_info"]
        assert got["target_pci"] == 301
        assert got["new_ue_identity"] == 0x4602
        assert got["rach_config_dedicated"]["ra_preamble_index"] == 7

    def test_connection_release(self):
        msg = {"rrc_transaction_identifier": 0,
               "critical_extensions": ("c1", ("r8", {
                   "release_cause": 0,
                   "redirected_carrier_info": ("eutra", 3400)}))}
        b = M.pack_dl_dcch("rrcConnectionRelease", msg)
        name, v = M.unpack_dl_dcch(b)
        assert name == "rrcConnectionRelease"
        assert v["critical_extensions"][1][1]["redirected_carrier_info"] \
            == ("eutra", 3400)

    def test_sib1_round_trip(self):
        sib1 = {"cell_access_related_info": {
                    "plmn_identity_list": [{
                        "plmn_identity": {"mcc": [0, 0, 1], "mnc": [0, 1]},
                        "cell_reserved_for_operator_use": "notReserved"}],
                    "tracking_area_code": 0x0007,
                    "cell_identity": 0x1A2D001,
                    "cell_barred": "notBarred",
                    "intra_freq_reselection": "allowed",
                    "csg_indication": False},
                "cell_selection_info": {"q_rx_lev_min": -65},
                "freq_band_indicator": 7,
                "scheduling_info_list": [
                    {"si_periodicity": 1, "sib_mapping_info": []},
                    {"si_periodicity": 2, "sib_mapping_info": [0]}],
                "si_window_length": 5, "system_info_value_tag": 9}
        b = M.pack_bcch_dlsch("systemInformationBlockType1", sib1)
        name, v = M.unpack_bcch_dlsch(b)
        assert name == "systemInformationBlockType1"
        assert v["cell_access_related_info"]["cell_identity"] == 0x1A2D001
        assert v["system_info_value_tag"] == 9
        assert len(v["scheduling_info_list"]) == 2

    def test_si_sib2_round_trip(self):
        sib2 = {"radio_resource_config_common": {
                    "rach_config_common": {
                        "preamble_info": {"number_of_ra_preambles": 12},
                        "power_ramping_parameters": {
                            "power_ramping_step": 1,
                            "preamble_initial_received_target_power": 6},
                        "ra_supervision_info": {
                            "preamble_trans_max": 6,
                            "ra_response_window_size": 7,
                            "mac_contention_resolution_timer": 5},
                        "max_harq_msg3_tx": 4},
                    "bcch_config": {"modification_period_coeff": 1},
                    "pcch_config": {"default_paging_cycle": 2, "nb": 3},
                    "prach_config": {
                        "root_sequence_index": 128,
                        "prach_config_info": {
                            "prach_config_index": 3, "high_speed_flag": False,
                            "zero_correlation_zone_config": 11,
                            "prach_freq_offset": 2}},
                    "pdsch_config_common": {"reference_signal_power": 18,
                                            "p_b": 0},
                    "pusch_config_common": {
                        "pusch_config_basic": {
                            "n_sb": 1, "hopping_mode": 0,
                            "pusch_hopping_offset": 4,
                            "enable_64qam": False},
                        "ul_reference_signals_pusch": {
                            "group_hopping_enabled": False,
                            "group_assignment_pusch": 0,
                            "sequence_hopping_enabled": False,
                            "cyclic_shift": 0}},
                    "pucch_config_common": {"delta_pucch_shift": 1,
                                            "n_rb_cqi": 2, "n_cs_an": 0,
                                            "n1_pucch_an": 12},
                    "sounding_rs_ul_config_common": ("release", None),
                    "uplink_power_control_common": {
                        "p0_nominal_pusch": -85, "alpha": 5,
                        "p0_nominal_pucch": -107,
                        "delta_flist_pucch": {
                            "delta_f_pucch_format1": 1,
                            "delta_f_pucch_format1b": 1,
                            "delta_f_pucch_format2": 1,
                            "delta_f_pucch_format2a": 1,
                            "delta_f_pucch_format2b": 1},
                        "delta_preamble_msg3": 4},
                    "ul_cyclic_prefix_length": 0},
                "ue_timers_and_constants": {"t300": 5, "t301": 5, "t310": 4,
                                            "n310": 5, "t311": 3, "n311": 0},
                "freq_info": {"additional_spectrum_emission": 1},
                "time_alignment_timer_common": 7}
        si = {"critical_extensions": ("systemInformation_r8",
              {"sib_type_and_info": [("sib2", sib2)]})}
        b = M.pack_bcch_dlsch("systemInformation", si)
        name, v = M.unpack_bcch_dlsch(b)
        got = v["critical_extensions"][1]["sib_type_and_info"][0]
        assert got[0] == "sib2"
        assert got[1]["radio_resource_config_common"]["prach_config"][
            "root_sequence_index"] == 128
        assert got[1]["ue_timers_and_constants"]["t310"] == 4

    def test_paging_round_trip(self):
        pg = {"paging_record_list": [
                  {"ue_identity": ("s_tmsi", {"mmec": 0x1A,
                                              "m_tmsi": 0xDEADBEEF}),
                   "cn_domain": "ps"},
                  {"ue_identity": ("imsi", [0, 0, 1, 0, 1, 0, 1, 2, 3, 4,
                                            5, 6, 7, 8, 9]),
                   "cn_domain": "cs"}],
              "system_info_modification": "true"}
        b = M.pack_pcch(pg)
        v = M.unpack_pcch(b)
        recs = v["paging_record_list"]
        assert recs[0]["ue_identity"][1]["m_tmsi"] == 0xDEADBEEF
        assert recs[1]["ue_identity"][0] == "imsi"
        assert len(recs[1]["ue_identity"][1]) == 15
        assert v["system_info_modification"] == "true"


class TestEngineProperties:
    def test_extension_passthrough(self):
        """Sequences with extension additions round-trip opaquely."""
        from empower_srslte_tpu.rrc.schema import Bool, Int, Seq, f

        t = Seq(f("a", Int(0, 7)), f("b", Bool(), optional=True), ext=True)
        w = BitWriter()
        t.pack(w, {"a": 5, "b": True, "_ext": [b"\x01\x02", None, b"\xFF"]})
        r = BitReader(w.to_bytes(), len(w))
        v = t.unpack(r)
        assert v["a"] == 5 and v["b"] is True
        assert v["_ext"] == [b"\x01\x02", None, b"\xFF"]
        w2 = BitWriter()
        t.pack(w2, v)
        assert w2.bits == w.bits


def _make_epc():
    from empower_srslte_tpu.epc import Hss, Subscriber
    from empower_srslte_tpu.epc.mme import Mme, UeNas
    from empower_srslte_tpu.upper import security

    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    op = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")
    opc = security.milenage_opc(k, op)
    imsi = "001010123456789"
    hss = Hss()
    hss.add_subscriber(Subscriber(name="t", auth_algo="mil", imsi=imsi,
                                  key=k, opc=opc))
    return Mme(hss), UeNas(imsi=imsi, key=k, opc=opc), k, opc, imsi


def _pump(ue, enb, max_rounds=30, transport=None):
    """Run the UE<->eNB message exchange to quiescence.

    transport: optional (ul_fn, dl_fn) that the PDUs pass through
    (e.g. RLC AM entities)."""
    srb, pdu = ue.connect()
    ul, dl = [(srb, pdu)], []
    rnti = None
    for _ in range(max_rounds):
        if not ul and not dl:
            break
        while ul:
            srb, pdu = ul.pop(0)
            if transport and srb != 0:
                pdu = transport[0](pdu)
            for m_rnti, m_srb, m_pdu in enb.handle_ul(
                    rnti if srb != 0 else 0, srb, pdu):
                rnti = m_rnti
                dl.append((m_srb, m_pdu))
        while dl:
            srb, pdu = dl.pop(0)
            if transport and srb != 0:
                pdu = transport[1](pdu)
            ul.extend(ue.handle_dl(srb, pdu))
    return rnti


class TestRrcProcedures:
    """Full attach over RRC messages (srsue/srsenb rrc.cc flow parity):
    CCCH setup -> NAS auth via UL/DLInformationTransfer -> AS security
    (K_eNB->K_RRCint, PDCP EIA2 on SRB1) -> reconfiguration carrying the
    attach accept + DRB1 + measConfig -> measurement-driven handover."""

    def test_full_attach_over_rrc(self):
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        _pump(ue, enb)
        assert ue.state == "connected"
        assert ue.security_activated
        assert "as_security_activated" in enb.events
        assert ue.nas.attached and ue.nas.ue_ip.startswith("172.16.0.")
        assert ue.drbs == [1]
        assert ue.meas_config is not None
        assert "reconfig_complete" in enb.events

    def test_attach_over_rlc_am_transport(self):
        """Same flow, but SRB1 PDUs ride through real RLC AM entities
        (segmentation at small PDU size + status exchange)."""
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc
        from empower_srslte_tpu.upper.rlc import RlcAm

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)

        def through_rlc(pdu):
            tx, rx = RlcAm(), RlcAm()
            tx.write_sdu(pdu)
            while True:
                p = tx.read_pdu(40)
                if p is None:
                    break
                rx.write_pdu(p)
            st = rx.get_status_pdu()
            if st is not None:
                tx.handle_status(st)
            assert rx.rx_sdus, "RLC did not deliver"
            return rx.rx_sdus[-1]

        _pump(ue, enb, transport=(through_rlc, through_rlc))
        assert ue.nas.attached and ue.drbs == [1]

    def test_measurement_handover(self):
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        # neighbour much stronger -> handover command with mobility info
        srb, mr = ue.send_measurement_report(50, 20, [(301, 70, 25)])
        for _, m_srb, m_pdu in enb.handle_ul(rnti, srb, mr):
            ue.handle_dl(m_srb, m_pdu)
        assert "handover_decision_301" in enb.events
        assert ue.serving_pci == 301
        assert "handover_to_301" in ue.events
        assert ue.c_rnti != 0

    def test_measurement_below_threshold_no_handover(self):
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        srb, mr = ue.send_measurement_report(60, 20, [(301, 61, 25)])
        out = enb.handle_ul(rnti, srb, mr)
        assert out == []
        assert not any("handover" in e for e in enb.events)

    def test_tampered_srb1_rejected(self):
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        srb, mr = ue.send_measurement_report(50, 20, [(301, 70, 25)])
        bad = bytearray(mr)
        bad[4] ^= 0x20
        out = enb.handle_ul(rnti, srb, bytes(bad))
        assert out == []
        assert "integrity_failure" in enb.events

    def test_wrong_usim_key_fails_auth(self):
        from empower_srslte_tpu.epc.mme import UeNas
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, k, opc, imsi = _make_epc()
        bad_nas = UeNas(imsi=imsi, key=b"\x13" * 16, opc=opc)
        ue = UeRrc(nas=bad_nas)
        enb = EnbRrc(mme=mme)
        _pump(ue, enb)
        # UE rejects the network (AUTN MAC mismatch with wrong K)
        assert not bad_nas.attached
        assert not ue.security_activated

    def test_two_ues_attach_same_enb(self):
        from empower_srslte_tpu.epc import Hss, Subscriber
        from empower_srslte_tpu.epc.mme import Mme, UeNas
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc
        from empower_srslte_tpu.upper import security

        k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
        opc = security.milenage_opc(
            k, bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318"))
        hss = Hss()
        for imsi in ("001010123456789", "001010123456790"):
            hss.add_subscriber(Subscriber(name="t", auth_algo="mil",
                                          imsi=imsi, key=k, opc=opc))
        enb = EnbRrc(mme=Mme(hss))
        ue1 = UeRrc(nas=UeNas(imsi="001010123456789", key=k, opc=opc))
        ue2 = UeRrc(nas=UeNas(imsi="001010123456790", key=k, opc=opc))
        _pump(ue1, enb)
        _pump(ue2, enb)
        assert ue1.nas.attached and ue2.nas.attached
        assert ue1.nas.ue_ip != ue2.nas.ue_ip

    def test_replayed_srb1_pdu_discarded(self):
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        srb, mr = ue.send_measurement_report(50, 20, [])
        enb.handle_ul(rnti, srb, mr)
        assert enb.handle_ul(rnti, srb, mr) == []   # replayed bytes
        assert enb.ues[rnti]["pdcp_rx"].replays_discarded == 1


class TestMcch:
    """MCCH / MBSFNAreaConfiguration (eMBMS control plane), bit-exact
    against the reference's srslte_asn1_rrc_mcch_test.cc golden."""

    GOLDEN = bytes([
        0x0d, 0x8f, 0xdf, 0xff, 0xff, 0xff, 0xe2, 0x2f, 0xfc, 0x38, 0x5e,
        0x61, 0xec, 0xa8, 0x00, 0x00, 0x02, 0x02, 0x10, 0x00, 0x20, 0x05,
        0xe6, 0x1e, 0xca, 0x80, 0x00, 0x00, 0x40, 0x42])

    MSG = {
        "commonsf_alloc": [
            {"radioframe_allocation_period": 5,
             "radioframe_allocation_offset": 4,
             "subframe_allocation": ("oneFrame", 0x3F)},
            {"radioframe_allocation_period": 3,
             "radioframe_allocation_offset": 7,
             "subframe_allocation": ("fourFrames", 0xFFFFFF)}],
        "commonsf_alloc_period": 6,
        "pmch_info_list": [
            {"pmch_config": {"sf_alloc_end": 1535, "data_mcs": 16,
                             "mch_scheduling_period": 7},
             "mbms_session_info_list": [
                 {"tmgi": {"plmn_id": ("explicitValue",
                                       {"mcc": [9, 8, 7], "mnc": [6, 5, 4]}),
                           "service_id": b"\x00\x00\x01"},
                  "session_id": b"\x01", "logical_channel_identity": 1}]},
            {"pmch_config": {"sf_alloc_end": 0, "data_mcs": 8,
                             "mch_scheduling_period": 0},
             "mbms_session_info_list": [
                 {"tmgi": {"plmn_id": ("explicitValue",
                                       {"mcc": [9, 8, 7], "mnc": [6, 5, 4]}),
                           "service_id": b"\x00\x00\x02"},
                  "session_id": b"\x02", "logical_channel_identity": 2}]}]}

    def test_pack_bit_exact(self):
        assert M.pack_mcch(self.MSG) == self.GOLDEN

    def test_unpack(self):
        v = M.unpack_mcch(self.GOLDEN)
        assert len(v["commonsf_alloc"]) == 2
        assert v["commonsf_alloc"][1]["subframe_allocation"] == \
            ("fourFrames", 0xFFFFFF)
        pi = v["pmch_info_list"]
        assert pi[0]["pmch_config"]["sf_alloc_end"] == 1535
        assert pi[0]["mbms_session_info_list"][0]["tmgi"]["service_id"] \
            == b"\x00\x00\x01"
        assert pi[1]["pmch_config"]["data_mcs"] == 8

    def test_reestablishment_after_rlf(self):
        """RLF recovery (36.331 5.3.7): shortMAC-I validated, both sides
        re-key with K_eNB*, signalling continues under the new keys."""
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        assert ue.security_activated
        ue.c_rnti = rnti
        ue.serving_pci = 0

        # RLF -> reestablishment over SRB0; the context migrates to the
        # C-RNTI of the new random access
        srb, req = ue.reestablish()
        dl = enb.handle_ul(0, srb, req)
        assert "reestablishment_ok" in enb.events
        new_rnti = dl[0][0]
        assert new_rnti != rnti and new_rnti in enb.ues
        assert rnti not in enb.ues
        for _, m_srb, m_pdu in dl:
            for u_srb, u_pdu in ue.handle_dl(m_srb, m_pdu):
                enb.handle_ul(new_rnti, u_srb, u_pdu)
        assert any(e.startswith("reestablished_ncc") for e in ue.events)
        assert ue.state == "connected"

        # new keys work both ways, old replay state reset
        srb, mr = ue.send_measurement_report(50, 20, [])
        enb.handle_ul(new_rnti, srb, mr)
        assert "integrity_failure" not in enb.events

    def test_reestablishment_forged_mac_rejected(self):
        from empower_srslte_tpu.rrc import messages as M2
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        bad = {"critical_extensions": ("r8", {
            "ue_identity": {"c_rnti": rnti, "phys_cell_id": 0,
                            "short_mac_i": 0x1234},
            "reestablishment_cause": 2, "spare": 0})}
        out = enb.handle_ul(0, 0, M2.pack_ul_ccch(
            "rrcConnectionReestablishmentRequest", bad))
        assert out == []
        assert "reestablishment_bad_mac" in enb.events

    def test_reestablishment_unknown_rnti_dropped(self):
        from empower_srslte_tpu.rrc import messages as M2
        from empower_srslte_tpu.rrc.procedures import EnbRrc

        mme, *_ = _make_epc()
        enb = EnbRrc(mme=mme)
        msg = {"critical_extensions": ("r8", {
            "ue_identity": {"c_rnti": 0x99, "phys_cell_id": 3,
                            "short_mac_i": 0},
            "reestablishment_cause": 2, "spare": 0})}
        assert enb.handle_ul(0, 0, M2.pack_ul_ccch(
            "rrcConnectionReestablishmentRequest", msg)) == []
        assert "reestablishment_unknown_ue" in enb.events

    def test_ue_capability_transfer(self):
        """5.6.3 capability transfer: protected enquiry -> information
        with a nested UPER-encoded UE-EUTRA-Capability container."""
        from empower_srslte_tpu.rrc.procedures import EnbRrc, UeRrc

        mme, ue_nas, *_ = _make_epc()
        ue = UeRrc(nas=ue_nas)
        enb = EnbRrc(mme=mme)
        rnti = _pump(ue, enb)
        r, srb, pdu = enb.send_capability_enquiry(rnti)
        for u_srb, u_pdu in ue.handle_dl(srb, pdu):
            enb.handle_ul(rnti, u_srb, u_pdu)
        assert "capability_sent" in ue.events
        cap = enb.ues[rnti]["eutra_capability"]
        assert cap["ue_category"] == 4
        assert cap["rf_parameters"]["supported_band_list_eutra"][0][
            "band_eutra"] == 7
        assert cap["meas_parameters"]["band_list_eutra"][0][
            "inter_freq_band_list"][0]["inter_freq_need_for_gaps"] is True
