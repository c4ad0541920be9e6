// Golden-vector generator for the 36.322 RLC UM/AM wire formats.
//
// Compiles against the *reference* RLC entities (lib/src/upper/rlc_am.cc,
// rlc_um.cc — used as an executable oracle only, no code copied) and
// prints the PDU byte strings the reference produces for fixed SDU/grant
// scenarios: UMD 5/10-bit headers with LI concatenation, AMD PDUs with
// poll bits, STATUS PDUs with NACKs, and AMD PDU segments from
// resegmentation under shrinking retx grants. The printed vectors are
// frozen into tests/test_rlc_wire.py.
//
// Build/run:
//   printf '#define SRSLTE_VERSION_MAJOR 18\n...' > /tmp/rlcbuild/srslte/version.h
//   g++ -O1 -I /tmp/rlcbuild -I /root/reference/lib/include \
//       tools/rlc_oracle.cc /root/reference/lib/src/upper/rlc_am.cc \
//       /root/reference/lib/src/upper/rlc_um.cc \
//       /root/reference/lib/src/common/buffer_pool.cc \
//       /root/reference/lib/src/phy/utils/bit.c -lpthread -o /tmp/rlc_oracle
//   /tmp/rlc_oracle

#include "srslte/upper/rlc_am.h"
#include "srslte/upper/rlc_um.h"
#include "srslte/common/log.h"
#include <cstdio>
#include <cstring>

using namespace srslte;
using namespace srsue;

// ---- minimal stubs (mirroring lib/test/upper/rlc_am_test.cc's mocks) ----

class quiet_log : public srslte::log {
public:
  quiet_log() : srslte::log("RLC") {}
  void console(const char*, ...) {}
  void error(const char*, ...) {}
  void warning(const char*, ...) {}
  void info(const char*, ...) {}
  void debug(const char*, ...) {}
  void error_hex(const uint8_t*, int, const char*, ...) {}
  void warning_hex(const uint8_t*, int, const char*, ...) {}
  void info_hex(const uint8_t*, int, const char*, ...) {}
  void debug_hex(const uint8_t*, int, const char*, ...) {}
};

class dummy_timers : public srslte::mac_interface_timers {
public:
  dummy_timers() : timers(64) {}
  srslte::timers::timer* timer_get(uint32_t id) { return timers.get(id); }
  void timer_release_id(uint32_t id) { timers.release_id(id); }
  uint32_t timer_get_unique_id() { return timers.get_unique_id(); }
  void step_all() { timers.step_all(); }
private:
  srslte::timers timers;
};

class sink : public pdcp_interface_rlc, public rrc_interface_rlc {
public:
  void write_pdu(uint32_t, byte_buffer_t* sdu) {
    byte_buffer_pool::get_instance()->deallocate(sdu);
  }
  void write_pdu_bcch_bch(byte_buffer_t* sdu) {
    byte_buffer_pool::get_instance()->deallocate(sdu);
  }
  void write_pdu_bcch_dlsch(byte_buffer_t* sdu) {
    byte_buffer_pool::get_instance()->deallocate(sdu);
  }
  void write_pdu_pcch(byte_buffer_t* sdu) {
    byte_buffer_pool::get_instance()->deallocate(sdu);
  }
  void write_pdu_mch(uint32_t, srslte::byte_buffer_t* sdu) {
    byte_buffer_pool::get_instance()->deallocate(sdu);
  }
  void max_retx_attempted() { printf("MAX_RETX\n"); }
  std::string get_rb_name(uint32_t) { return "DRB1"; }
};

static void show(const char* name, uint8_t* buf, int n) {
  printf("%s ", name);
  for (int i = 0; i < n; i++) printf("%02x", buf[i]);
  printf("\n");
}

static byte_buffer_t* make_sdu(uint8_t seed, int len) {
  byte_buffer_t* b = byte_buffer_pool::get_instance()->allocate();
  for (int i = 0; i < len; i++) b->msg[i] = seed + i;
  b->N_bytes = len;
  return b;
}

static srslte_rlc_config_t am_config() {
  srslte_rlc_config_t cfg;
  cfg.rlc_mode = RLC_MODE_AM;
  cfg.am.t_poll_retx = 45;
  cfg.am.poll_pdu = 4;
  cfg.am.poll_byte = 25000;
  cfg.am.max_retx_thresh = 4;
  cfg.am.t_reordering = 35;
  cfg.am.t_status_prohibit = 0;
  return cfg;
}

static srslte_rlc_config_t um_config(rlc_umd_sn_size_t sn) {
  srslte_rlc_config_t cfg;
  cfg.rlc_mode = RLC_MODE_UM;
  cfg.um.t_reordering = 5;
  cfg.um.rx_sn_field_length = sn;
  cfg.um.tx_sn_field_length = sn;
  cfg.um.rx_window_size = (sn == RLC_UMD_SN_SIZE_5_BITS) ? 16 : 512;
  cfg.um.rx_mod = (sn == RLC_UMD_SN_SIZE_5_BITS) ? 32 : 1024;
  cfg.um.tx_mod = cfg.um.rx_mod;
  cfg.um.is_mrb = false;
  return cfg;
}

static quiet_log lg;
static dummy_timers g_timers;
static sink snk;
static uint8_t buf[4096];

int main() {
  // ================= UM 10-bit: concatenation with LIs ==================
  {
    rlc_um um;
    um.init(&lg, 3, &snk, &snk, &g_timers);
    um.configure(um_config(RLC_UMD_SN_SIZE_10_BITS));
    um.write_sdu(make_sdu(0x10, 5));
    um.write_sdu(make_sdu(0x20, 7));
    um.write_sdu(make_sdu(0x30, 20));
    // grant 18: SDU1(5) + SDU2(7) + start of SDU3 concatenated w/ 2 LIs
    int n = um.read_pdu(buf, 18);
    show("UM10_CONCAT", buf, n);
    // rest of SDU3
    n = um.read_pdu(buf, 100);
    show("UM10_TAIL", buf, n);
  }

  // ================= UM 5-bit SN =========================================
  {
    rlc_um um;
    um.init(&lg, 3, &snk, &snk, &g_timers);
    um.configure(um_config(RLC_UMD_SN_SIZE_5_BITS));
    um.write_sdu(make_sdu(0x40, 4));
    um.write_sdu(make_sdu(0x50, 6));
    int n = um.read_pdu(buf, 8);      // segment of SDU1? grant 8 = hdr1+4+..
    show("UM5_A", buf, n);
    n = um.read_pdu(buf, 100);
    show("UM5_B", buf, n);
  }

  // ================= AM: concatenation + poll ============================
  {
    rlc_am tx;
    tx.init(&lg, 1, &snk, &snk, &g_timers);
    tx.configure(am_config());
    tx.write_sdu(make_sdu(0x10, 5), true);
    tx.write_sdu(make_sdu(0x20, 7), true);
    int n = tx.read_pdu(buf, 30);     // both SDUs in one AMD PDU w/ LI
    show("AM_CONCAT", buf, n);

    // segmentation: one SDU split over two grants
    tx.write_sdu(make_sdu(0x30, 25), true);
    n = tx.read_pdu(buf, 12);
    show("AM_SEG1", buf, n);
    n = tx.read_pdu(buf, 100);
    show("AM_SEG2", buf, n);
  }

  // ================= AM: status + retransmission =========================
  {
    rlc_am tx, rx;
    tx.init(&lg, 1, &snk, &snk, &g_timers);
    rx.init(&lg, 1, &snk, &snk, &g_timers);
    tx.configure(am_config());
    rx.configure(am_config());
    for (int i = 0; i < 4; i++) tx.write_sdu(make_sdu(0x10 * (i + 1), 8), true);
    uint8_t pdus[4][64];
    int lens[4];
    for (int i = 0; i < 4; i++) {
      lens[i] = tx.read_pdu(pdus[i], 10);  // one SDU per PDU (hdr 2 + 8)
      show("AM_TXPDU", pdus[i], lens[i]);
    }
    // deliver all but #1 to RX; poll bit on #3 triggers status
    for (int i = 0; i < 4; i++)
      if (i != 1) rx.write_pdu(pdus[i], lens[i]);
    for (int t = 0; t < 40; t++) g_timers.step_all();   // t_reordering
    int n = rx.read_pdu(buf, 64);      // STATUS with NACK_SN=1
    show("AM_STATUS_NACK1", buf, n);
    tx.write_pdu(buf, n);
    // full-size retx grant: unsegmented retx of SN=1
    n = tx.read_pdu(buf, 64);
    show("AM_RETX_FULL", buf, n);
  }

  // ================= AM: resegmentation under a shrinking grant ==========
  {
    rlc_am tx, rx;
    tx.init(&lg, 1, &snk, &snk, &g_timers);
    rx.init(&lg, 1, &snk, &snk, &g_timers);
    tx.configure(am_config());
    rx.configure(am_config());
    tx.write_sdu(make_sdu(0xA0, 30), true);
    tx.write_sdu(make_sdu(0xD0, 5), true);
    uint8_t p0[64], p1[64];
    int l0 = tx.read_pdu(p0, 32);      // SN=0: 30-byte SDU
    int l1 = tx.read_pdu(p1, 64);      // SN=1: second SDU, polled
    show("AM_RESEG_TXPDU0", p0, l0);
    show("AM_RESEG_TXPDU1", p1, l1);
    rx.write_pdu(p1, l1);              // drop SN=0
    for (int t = 0; t < 40; t++) g_timers.step_all();
    int n = rx.read_pdu(buf, 64);
    show("AM_RESEG_STATUS", buf, n);
    tx.write_pdu(buf, n);
    // retx grants smaller than the original PDU -> AMD PDU segments
    n = tx.read_pdu(buf, 14);
    show("AM_RESEG_SEG1", buf, n);
    rx.write_pdu(buf, n);
    n = tx.read_pdu(buf, 14);
    show("AM_RESEG_SEG2", buf, n);
    rx.write_pdu(buf, n);
    n = tx.read_pdu(buf, 20);
    show("AM_RESEG_SEG3", buf, n);
    rx.write_pdu(buf, n);
    n = rx.read_pdu(buf, 64);          // status acking everything
    show("AM_RESEG_STATUS2", buf, n);
  }

  // ================= AM: status with SO-range NACK ========================
  {
    // build a status PDU via the reference struct packers directly
    rlc_status_pdu_t st;
    memset(&st, 0, sizeof(st));
    st.ack_sn = 7;
    st.N_nack = 2;
    st.nacks[0].nack_sn = 2;
    st.nacks[1].nack_sn = 4;
    st.nacks[1].has_so = true;
    st.nacks[1].so_start = 3;
    st.nacks[1].so_end = 12;
    byte_buffer_t b;
    rlc_am_write_status_pdu(&st, &b);
    show("AM_STATUS_SO", b.msg, b.N_bytes);
  }

  return 0;
}
