"""libconfig-grammar parser (runtime.libconf) — grammar units plus
parsing the reference's actual sib/rr/drb example files when present."""

import os

import pytest

from empower_srslte_tpu.runtime.libconf import (load_drb_conf, load_mac_cnfg,
                                                load_sib_conf, parse,
                                                parse_file)

REF = "/root/reference/srsenb"


class TestGrammar:
    def test_scalars(self):
        d = parse('a = 1; b = -2.5; c = true; d = "hi"; e = 0x1F; f = 12L;')
        assert d == dict(a=1, b=-2.5, c=True, d="hi", e=31, f=12)

    def test_nested_groups_lists_arrays(self):
        d = parse("""
        top = {
            sub = { x = 1; };
            lst = ( { y = 2; }, { y = 3; } );
            arr = [1, 2, 3];
        };
        """)
        assert d["top"]["sub"]["x"] == 1
        assert [e["y"] for e in d["top"]["lst"]] == [2, 3]
        assert d["top"]["arr"] == [1, 2, 3]

    def test_comments_and_optional_semicolons(self):
        d = parse("""
        // line comment
        # hash comment
        /* block
           comment */
        a = "no semicolon"
        b = 2;
        """)
        assert d["a"] == "no semicolon" and d["b"] == 2

    def test_colon_assignment_and_empty_array(self):
        d = parse("a : 5; m = []; ")
        assert d == dict(a=5, m=[])

    def test_bad_token_raises(self):
        with pytest.raises(ValueError):
            parse("a = @@;")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
class TestReferenceFiles:
    def test_rr_conf(self):
        rr = parse_file(f"{REF}/rr.conf.example")
        cfg = load_mac_cnfg(rr)
        assert cfg.periodic_bsr_timer_ms == 20
        assert cfg.retx_bsr_timer_ms == 320
        assert cfg.dsr_trans_max == 64
        assert cfg.dl_pathloss_change_db == 3
        assert cfg.periodic_phr_timer_ms == 50

    def test_drb_conf(self):
        qcis = load_drb_conf(parse_file(f"{REF}/drb.conf.example"))
        assert qcis[7].rlc_mode == "um"
        assert qcis[9].rlc_mode == "am"
        assert qcis[9].status_report_required
        assert qcis[7].log_chan_group == 2

    def test_sib_conf(self):
        sib = load_sib_conf(parse_file(f"{REF}/sib.conf.example"))
        assert sib["sib1"]["si_window_length"] == 20
        assert not sib["sib1"]["cell_barred"]
        assert sib["sib2"]["root_sequence_index"] == 128
        assert sib["sib2"]["prach_config_index"] == 3
