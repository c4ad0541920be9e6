// Golden-vector generator for the 24.301 NAS codecs.
//
// Compiles against the *reference* codec (lib/src/asn1/liblte_mme.cc — used
// as an executable oracle only, no code copied) and prints the byte string
// the reference produces for a fixed set of EMM/ESM message values. The
// printed vectors are frozen into tests/test_nas.py and checked against
// empower_srslte_tpu/epc/nas.py.
//
// Build/run:
//   g++ -O1 -I /root/reference/lib/include tools/nas_oracle.cc \
//       /root/reference/lib/src/asn1/liblte_mme.cc \
//       /root/reference/lib/src/asn1/liblte_common.cc -o /tmp/nas_oracle
//   /tmp/nas_oracle

#include "srslte/asn1/liblte_mme.h"
#include <cstdio>
#include <cstring>

static LIBLTE_BYTE_MSG_STRUCT out;

static void show(const char* name) {
  printf("%s ", name);
  for (uint32 i = 0; i < out.N_bytes; i++) printf("%02x", out.msg[i]);
  printf("\n");
  memset(&out, 0, sizeof(out));  // deterministic 00000000 MAC placeholders
}

static void fill_imsi(uint8* dst) {  // 001010123456789
  const uint8 d[15] = {0,0,1, 0,1, 0,1,2,3,4,5,6,7,8,9};
  memcpy(dst, d, 15);
}

static LIBLTE_MME_EPS_MOBILE_ID_STRUCT make_guti() {
  LIBLTE_MME_EPS_MOBILE_ID_STRUCT id;
  memset(&id, 0, sizeof(id));
  id.type_of_id = LIBLTE_MME_EPS_MOBILE_ID_TYPE_GUTI;
  id.guti.mcc = 1; id.guti.mnc = 1;  // 001/01
  id.guti.mme_group_id = 0x0002;
  id.guti.mme_code = 0x1A;
  id.guti.m_tmsi = 0xD0B0C0A0;
  return id;
}

static LIBLTE_MME_TRACKING_AREA_IDENTITY_LIST_STRUCT make_tai_list() {
  LIBLTE_MME_TRACKING_AREA_IDENTITY_LIST_STRUCT tl;
  memset(&tl, 0, sizeof(tl));
  tl.N_tais = 1;
  tl.tai[0].mcc = 1; tl.tai[0].mnc = 1; tl.tai[0].tac = 0x0007;
  return tl;
}

int main() {
  // ====================== ESM messages (built first, some are containers)
  // ---- PDN Connectivity Request (initial, IPv4, ESM info transfer flag)
  LIBLTE_MME_PDN_CONNECTIVITY_REQUEST_MSG_STRUCT pdn_req;
  memset(&pdn_req, 0, sizeof(pdn_req));
  pdn_req.eps_bearer_id = 0;
  pdn_req.proc_transaction_id = 1;
  pdn_req.pdn_type = LIBLTE_MME_PDN_TYPE_IPV4;
  pdn_req.request_type = LIBLTE_MME_REQUEST_TYPE_INITIAL_REQUEST;
  pdn_req.esm_info_transfer_flag_present = true;
  pdn_req.esm_info_transfer_flag = LIBLTE_MME_ESM_INFO_TRANSFER_FLAG_REQUIRED;
  liblte_mme_pack_pdn_connectivity_request_msg(&pdn_req, &out);
  LIBLTE_BYTE_MSG_STRUCT pdn_req_bytes = out;
  show("PDN_CONNECTIVITY_REQUEST");

  // ---- PDN Connectivity Request (with APN + PCO)
  pdn_req.apn_present = true;
  strcpy(pdn_req.apn.apn, "srsapn");
  pdn_req.protocol_cnfg_opts_present = true;
  pdn_req.protocol_cnfg_opts.N_opts = 2;
  pdn_req.protocol_cnfg_opts.opt[0].id =
      LIBLTE_MME_ADDITIONAL_PARAMETERS_UL_IP_ADDRESS_ALLOCATION_VIA_NAS_SIGNALLING;
  pdn_req.protocol_cnfg_opts.opt[0].len = 0;
  pdn_req.protocol_cnfg_opts.opt[1].id =
      LIBLTE_MME_ADDITIONAL_PARAMETERS_UL_DNS_SERVER_IPV4_ADDRESS_REQUEST;
  pdn_req.protocol_cnfg_opts.opt[1].len = 0;
  liblte_mme_pack_pdn_connectivity_request_msg(&pdn_req, &out);
  show("PDN_CONNECTIVITY_REQUEST_FULL");

  // ---- PDN Connectivity Reject
  LIBLTE_MME_PDN_CONNECTIVITY_REJECT_MSG_STRUCT pdn_rej;
  memset(&pdn_rej, 0, sizeof(pdn_rej));
  pdn_rej.eps_bearer_id = 0;
  pdn_rej.proc_transaction_id = 1;
  pdn_rej.esm_cause = 0x1B;  // unknown APN
  liblte_mme_pack_pdn_connectivity_reject_msg(&pdn_rej, &out);
  show("PDN_CONNECTIVITY_REJECT");

  // ---- ESM Information Request
  LIBLTE_MME_ESM_INFORMATION_REQUEST_MSG_STRUCT esm_ir;
  memset(&esm_ir, 0, sizeof(esm_ir));
  esm_ir.eps_bearer_id = 0;
  esm_ir.proc_transaction_id = 1;
  liblte_mme_pack_esm_information_request_msg(&esm_ir, &out);
  show("ESM_INFORMATION_REQUEST");

  // ---- ESM Information Response (APN + PCO)
  LIBLTE_MME_ESM_INFORMATION_RESPONSE_MSG_STRUCT esm_resp;
  memset(&esm_resp, 0, sizeof(esm_resp));
  esm_resp.eps_bearer_id = 0;
  esm_resp.proc_transaction_id = 1;
  esm_resp.apn_present = true;
  strcpy(esm_resp.apn.apn, "internet");
  liblte_mme_pack_esm_information_response_msg(
      &esm_resp, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
  show("ESM_INFORMATION_RESPONSE");

  // ---- Activate Default EPS Bearer Context Request (QCI9, APN, IPv4, AMBR)
  LIBLTE_MME_ACTIVATE_DEFAULT_EPS_BEARER_CONTEXT_REQUEST_MSG_STRUCT adb;
  memset(&adb, 0, sizeof(adb));
  adb.eps_bearer_id = 5;
  adb.proc_transaction_id = 1;
  adb.eps_qos.qci = 9;
  strcpy(adb.apn.apn, "srsapn");
  adb.pdn_addr.pdn_type = LIBLTE_MME_PDN_TYPE_IPV4;
  adb.pdn_addr.addr[0] = 172; adb.pdn_addr.addr[1] = 16;
  adb.pdn_addr.addr[2] = 0;   adb.pdn_addr.addr[3] = 2;
  adb.apn_ambr_present = true;
  adb.apn_ambr.apn_ambr_dl = 254; adb.apn_ambr.apn_ambr_ul = 254;
  adb.protocol_cnfg_opts_present = true;
  adb.protocol_cnfg_opts.N_opts = 1;
  adb.protocol_cnfg_opts.opt[0].id =
      LIBLTE_MME_ADDITIONAL_PARAMETERS_DL_DNS_SERVER_IPV4_ADDRESS;
  adb.protocol_cnfg_opts.opt[0].len = 4;
  adb.protocol_cnfg_opts.opt[0].contents[0] = 8;
  adb.protocol_cnfg_opts.opt[0].contents[1] = 8;
  adb.protocol_cnfg_opts.opt[0].contents[2] = 8;
  adb.protocol_cnfg_opts.opt[0].contents[3] = 8;
  liblte_mme_pack_activate_default_eps_bearer_context_request_msg(&adb, &out);
  LIBLTE_BYTE_MSG_STRUCT adb_bytes = out;
  show("ACTIVATE_DEFAULT_BEARER_REQUEST");

  // ---- Activate Default EPS Bearer Context Accept
  LIBLTE_MME_ACTIVATE_DEFAULT_EPS_BEARER_CONTEXT_ACCEPT_MSG_STRUCT adba;
  memset(&adba, 0, sizeof(adba));
  adba.eps_bearer_id = 5;
  adba.proc_transaction_id = 1;
  liblte_mme_pack_activate_default_eps_bearer_context_accept_msg(&adba, &out);
  LIBLTE_BYTE_MSG_STRUCT adba_bytes = out;
  show("ACTIVATE_DEFAULT_BEARER_ACCEPT");

  // ---- Activate Default EPS Bearer Context Reject
  LIBLTE_MME_ACTIVATE_DEFAULT_EPS_BEARER_CONTEXT_REJECT_MSG_STRUCT adbr;
  memset(&adbr, 0, sizeof(adbr));
  adbr.eps_bearer_id = 5;
  adbr.proc_transaction_id = 1;
  adbr.esm_cause = 0x5F;
  liblte_mme_pack_activate_default_eps_bearer_context_reject_msg(&adbr, &out);
  show("ACTIVATE_DEFAULT_BEARER_REJECT");

  // ---- Activate Dedicated EPS Bearer Context Request (TFT w/ 1 filter)
  LIBLTE_MME_ACTIVATE_DEDICATED_EPS_BEARER_CONTEXT_REQUEST_MSG_STRUCT ded;
  memset(&ded, 0, sizeof(ded));
  ded.eps_bearer_id = 6;
  ded.proc_transaction_id = 2;
  ded.linked_eps_bearer_id = 5;
  ded.eps_qos.qci = 1;
  ded.eps_qos.br_present = true;
  ded.eps_qos.mbr_ul = 100; ded.eps_qos.mbr_dl = 100;
  ded.eps_qos.gbr_ul = 50;  ded.eps_qos.gbr_dl = 50;
  ded.tft.tft_op_code = LIBLTE_MME_TFT_OPERATION_CODE_CREATE_NEW_TFT;
  ded.tft.packet_filter_list_size = 1;
  ded.tft.packet_filter_list[0].dir =
      LIBLTE_MME_TFT_PACKET_FILTER_DIRECTION_BIDIRECTIONAL;
  ded.tft.packet_filter_list[0].id = 1;
  ded.tft.packet_filter_list[0].eval_precedence = 0;
  ded.tft.packet_filter_list[0].filter_size = 3;
  ded.tft.packet_filter_list[0].filter[0] =
      LIBLTE_MME_TFT_PACKET_FILTER_COMPONENT_TYPE_ID_SINGLE_REMOTE_PORT_TYPE;
  ded.tft.packet_filter_list[0].filter[1] = 0x13;  // port 5001
  ded.tft.packet_filter_list[0].filter[2] = 0x89;
  liblte_mme_pack_activate_dedicated_eps_bearer_context_request_msg(&ded, &out);
  show("ACTIVATE_DEDICATED_BEARER_REQUEST");

  // ---- Activate Dedicated EPS Bearer Context Accept
  LIBLTE_MME_ACTIVATE_DEDICATED_EPS_BEARER_CONTEXT_ACCEPT_MSG_STRUCT deda;
  memset(&deda, 0, sizeof(deda));
  deda.eps_bearer_id = 6;
  deda.proc_transaction_id = 2;
  liblte_mme_pack_activate_dedicated_eps_bearer_context_accept_msg(&deda, &out);
  show("ACTIVATE_DEDICATED_BEARER_ACCEPT");

  // ---- Deactivate EPS Bearer Context Request / Accept
  LIBLTE_MME_DEACTIVATE_EPS_BEARER_CONTEXT_REQUEST_MSG_STRUCT dbr;
  memset(&dbr, 0, sizeof(dbr));
  dbr.eps_bearer_id = 6;
  dbr.proc_transaction_id = 3;
  dbr.esm_cause = 0x24;  // regular deactivation
  liblte_mme_pack_deactivate_eps_bearer_context_request_msg(&dbr, &out);
  show("DEACTIVATE_BEARER_REQUEST");

  LIBLTE_MME_DEACTIVATE_EPS_BEARER_CONTEXT_ACCEPT_MSG_STRUCT dba;
  memset(&dba, 0, sizeof(dba));
  dba.eps_bearer_id = 6;
  dba.proc_transaction_id = 3;
  liblte_mme_pack_deactivate_eps_bearer_context_accept_msg(&dba, &out);
  show("DEACTIVATE_BEARER_ACCEPT");

  // ---- PDN Disconnect Request
  LIBLTE_MME_PDN_DISCONNECT_REQUEST_MSG_STRUCT pdr;
  memset(&pdr, 0, sizeof(pdr));
  pdr.eps_bearer_id = 0;
  pdr.proc_transaction_id = 4;
  pdr.linked_eps_bearer_id = 5;
  liblte_mme_pack_pdn_disconnect_request_msg(&pdr, &out);
  show("PDN_DISCONNECT_REQUEST");

  // ---- ESM Status
  LIBLTE_MME_ESM_STATUS_MSG_STRUCT esm_st;
  memset(&esm_st, 0, sizeof(esm_st));
  esm_st.eps_bearer_id = 5;
  esm_st.proc_transaction_id = 0;
  esm_st.esm_cause = 0x62;  // message type non-existent
  liblte_mme_pack_esm_status_msg(&esm_st, &out);
  show("ESM_STATUS");

  // ====================== EMM messages
  // ---- Attach Request (IMSI, EPS attach, minimal caps; ESM = PDN conn req)
  LIBLTE_MME_ATTACH_REQUEST_MSG_STRUCT ar;
  memset(&ar, 0, sizeof(ar));
  ar.eps_attach_type = LIBLTE_MME_EPS_ATTACH_TYPE_EPS_ATTACH;
  ar.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
  ar.nas_ksi.nas_ksi = 0;
  ar.eps_mobile_id.type_of_id = LIBLTE_MME_EPS_MOBILE_ID_TYPE_IMSI;
  fill_imsi(ar.eps_mobile_id.imsi);
  ar.ue_network_cap.eea[0] = true;  // EEA0
  ar.ue_network_cap.eea[1] = true;  ar.ue_network_cap.eea[2] = true;
  ar.ue_network_cap.eia[1] = true;  ar.ue_network_cap.eia[2] = true;
  ar.esm_msg = pdn_req_bytes;
  liblte_mme_pack_attach_request_msg(&ar, &out);
  show("ATTACH_REQUEST");

  // ---- Attach Request (GUTI id + last visited TAI + old GUTI type)
  LIBLTE_MME_ATTACH_REQUEST_MSG_STRUCT ar2 = ar;
  ar2.eps_mobile_id = make_guti();
  ar2.last_visited_registered_tai_present = true;
  ar2.last_visited_registered_tai.mcc = 1;
  ar2.last_visited_registered_tai.mnc = 1;
  ar2.last_visited_registered_tai.tac = 0x0007;
  ar2.old_guti_type_present = true;
  ar2.old_guti_type = LIBLTE_MME_GUTI_TYPE_NATIVE;
  liblte_mme_pack_attach_request_msg(&ar2, &out);
  show("ATTACH_REQUEST_GUTI");

  // ---- Attach Accept (integrity header, count=5; GUTI option)
  LIBLTE_MME_ATTACH_ACCEPT_MSG_STRUCT aa;
  memset(&aa, 0, sizeof(aa));
  aa.eps_attach_result = LIBLTE_MME_EPS_ATTACH_RESULT_EPS_ONLY;
  aa.t3412.unit = LIBLTE_MME_GPRS_TIMER_UNIT_6_MINUTES;
  aa.t3412.value = 30;
  aa.tai_list = make_tai_list();
  aa.esm_msg = adb_bytes;
  aa.guti_present = true;
  aa.guti = make_guti();
  liblte_mme_pack_attach_accept_msg(
      &aa, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 5, &out);
  show("ATTACH_ACCEPT");

  // ---- Attach Complete
  LIBLTE_MME_ATTACH_COMPLETE_MSG_STRUCT ac;
  memset(&ac, 0, sizeof(ac));
  ac.esm_msg = adba_bytes;
  liblte_mme_pack_attach_complete_msg(
      &ac, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 1, &out);
  show("ATTACH_COMPLETE");

  // ---- Attach Reject
  LIBLTE_MME_ATTACH_REJECT_MSG_STRUCT arj;
  memset(&arj, 0, sizeof(arj));
  arj.emm_cause = 0x03;  // illegal UE
  liblte_mme_pack_attach_reject_msg(&arj, &out);
  show("ATTACH_REJECT");

  // ---- Authentication Request
  LIBLTE_MME_AUTHENTICATION_REQUEST_MSG_STRUCT areq;
  memset(&areq, 0, sizeof(areq));
  areq.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
  areq.nas_ksi.nas_ksi = 0;
  for (int i = 0; i < 16; i++) { areq.rand[i] = i; areq.autn[i] = 0xF0 | i; }
  liblte_mme_pack_authentication_request_msg(&areq, &out);
  show("AUTHENTICATION_REQUEST");

  // ---- Authentication Response (8-byte RES)
  LIBLTE_MME_AUTHENTICATION_RESPONSE_MSG_STRUCT arsp;
  memset(&arsp, 0, sizeof(arsp));
  arsp.res_len = 8;
  for (int i = 0; i < 8; i++) arsp.res[i] = 0xA0 | i;
  liblte_mme_pack_authentication_response_msg(
      &arsp, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
  show("AUTHENTICATION_RESPONSE");

  // ---- Authentication Failure (sync failure + AUTS)
  LIBLTE_MME_AUTHENTICATION_FAILURE_MSG_STRUCT afl;
  memset(&afl, 0, sizeof(afl));
  afl.emm_cause = 0x15;  // synch failure
  afl.auth_fail_param_present = true;
  for (int i = 0; i < 14; i++) afl.auth_fail_param[i] = 0x30 + i;
  liblte_mme_pack_authentication_failure_msg(&afl, &out);
  show("AUTHENTICATION_FAILURE");

  // ---- Authentication Reject
  LIBLTE_MME_AUTHENTICATION_REJECT_MSG_STRUCT arej;
  liblte_mme_pack_authentication_reject_msg(&arej, &out);
  show("AUTHENTICATION_REJECT");

  // ---- Identity Request / Response
  LIBLTE_MME_ID_REQUEST_MSG_STRUCT idr;
  idr.id_type = LIBLTE_MME_ID_TYPE_2_IMSI;
  liblte_mme_pack_identity_request_msg(&idr, &out);
  show("IDENTITY_REQUEST");

  LIBLTE_MME_ID_RESPONSE_MSG_STRUCT idresp;
  memset(&idresp, 0, sizeof(idresp));
  idresp.mobile_id.type_of_id = LIBLTE_MME_MOBILE_ID_TYPE_IMSI;
  fill_imsi(idresp.mobile_id.imsi);
  liblte_mme_pack_identity_response_msg(&idresp, &out);
  show("IDENTITY_RESPONSE");

  // ---- Security Mode Command (EEA0/EIA2, replayed caps)
  LIBLTE_MME_SECURITY_MODE_COMMAND_MSG_STRUCT smc;
  memset(&smc, 0, sizeof(smc));
  smc.selected_nas_sec_algs.type_of_eea =
      LIBLTE_MME_TYPE_OF_CIPHERING_ALGORITHM_EEA0;
  smc.selected_nas_sec_algs.type_of_eia =
      LIBLTE_MME_TYPE_OF_INTEGRITY_ALGORITHM_128_EIA2;
  smc.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
  smc.nas_ksi.nas_ksi = 0;
  smc.ue_security_cap.eea[0] = true;
  smc.ue_security_cap.eea[1] = true; smc.ue_security_cap.eea[2] = true;
  smc.ue_security_cap.eia[1] = true; smc.ue_security_cap.eia[2] = true;
  smc.imeisv_req_present = true;
  smc.imeisv_req = LIBLTE_MME_IMEISV_REQUESTED;
  liblte_mme_pack_security_mode_command_msg(
      &smc, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_WITH_NEW_EPS_SECURITY_CONTEXT,
      0, &out);
  show("SECURITY_MODE_COMMAND");

  // ---- Security Mode Complete (no IMEISV)
  LIBLTE_MME_SECURITY_MODE_COMPLETE_MSG_STRUCT smcp;
  memset(&smcp, 0, sizeof(smcp));
  liblte_mme_pack_security_mode_complete_msg(
      &smcp, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED_WITH_NEW_EPS_SECURITY_CONTEXT,
      0, &out);
  show("SECURITY_MODE_COMPLETE");

  // ---- Security Mode Reject
  LIBLTE_MME_SECURITY_MODE_REJECT_MSG_STRUCT smr;
  smr.emm_cause = 0x18;  // security mode rejected, unspecified
  liblte_mme_pack_security_mode_reject_msg(&smr, &out);
  show("SECURITY_MODE_REJECT");

  // ---- EMM Information (names + tz)
  LIBLTE_MME_EMM_INFORMATION_MSG_STRUCT ei;
  memset(&ei, 0, sizeof(ei));
  ei.full_net_name_present = true;
  strcpy(ei.full_net_name.name, "srsLTE");
  ei.full_net_name.add_ci = LIBLTE_MME_ADD_CI_DONT_ADD;
  ei.short_net_name_present = true;
  strcpy(ei.short_net_name.name, "srs");
  ei.short_net_name.add_ci = LIBLTE_MME_ADD_CI_DONT_ADD;
  ei.local_time_zone_present = true;
  ei.local_time_zone = 0x40;
  liblte_mme_pack_emm_information_msg(
      &ei, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 2, &out);
  show("EMM_INFORMATION");

  // ---- EMM Status
  LIBLTE_MME_EMM_STATUS_MSG_STRUCT es;
  es.emm_cause = 0x61;  // message type non-existent
  liblte_mme_pack_emm_status_msg(
      &es, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
  show("EMM_STATUS");

  // ---- Detach Request (UE-originating, switch off, GUTI)
  LIBLTE_MME_DETACH_REQUEST_MSG_STRUCT dr;
  memset(&dr, 0, sizeof(dr));
  dr.detach_type.switch_off = 1;
  dr.detach_type.type_of_detach = LIBLTE_MME_TOD_UL_EPS_DETACH;
  dr.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
  dr.nas_ksi.nas_ksi = 0;
  dr.eps_mobile_id = make_guti();
  liblte_mme_pack_detach_request_msg(
      &dr, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 7, &out);
  show("DETACH_REQUEST");

  // ---- Detach Accept
  LIBLTE_MME_DETACH_ACCEPT_MSG_STRUCT da;
  liblte_mme_pack_detach_accept_msg(
      &da, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 3, &out);
  show("DETACH_ACCEPT");

  // ---- Service Request (ksi=0, seq=5, short mac)
  LIBLTE_MME_SERVICE_REQUEST_MSG_STRUCT sr;
  sr.ksi_and_seq_num.ksi = 0;
  sr.ksi_and_seq_num.seq_num = 5;
  sr.short_mac = 0xBEEF;
  liblte_mme_pack_service_request_msg(&sr, &out);
  show("SERVICE_REQUEST");

  // ---- Service Reject (w/ T3442)
  LIBLTE_MME_SERVICE_REJECT_MSG_STRUCT srj;
  memset(&srj, 0, sizeof(srj));
  srj.emm_cause = 0x27;  // no EPS bearer context activated
  srj.t3442_present = true;
  srj.t3442.unit = LIBLTE_MME_GPRS_TIMER_UNIT_1_MINUTE;
  srj.t3442.value = 2;
  liblte_mme_pack_service_reject_msg(
      &srj, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
  show("SERVICE_REJECT");

  // ---- Extended Service Request
  LIBLTE_MME_EXTENDED_SERVICE_REQUEST_MSG_STRUCT esr;
  memset(&esr, 0, sizeof(esr));
  esr.service_type = 0;  // mobile originating CSFB
  esr.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
  esr.nas_ksi.nas_ksi = 0;
  esr.m_tmsi.type_of_id = LIBLTE_MME_MOBILE_ID_TYPE_TMSI;
  esr.m_tmsi.tmsi = 0xD0B0C0A0;
  liblte_mme_pack_extended_service_request_msg(
      &esr, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 4, &out);
  show("EXTENDED_SERVICE_REQUEST");

  // ---- TAU Accept (update result + t3412 + GUTI + TAI list)
  LIBLTE_MME_TRACKING_AREA_UPDATE_ACCEPT_MSG_STRUCT taua;
  memset(&taua, 0, sizeof(taua));
  taua.eps_update_result = LIBLTE_MME_EPS_UPDATE_RESULT_TA_UPDATED;
  taua.t3412_present = true;
  taua.t3412.unit = LIBLTE_MME_GPRS_TIMER_UNIT_6_MINUTES;
  taua.t3412.value = 30;
  taua.guti_present = true;
  taua.guti = make_guti();
  taua.tai_list_present = true;
  taua.tai_list = make_tai_list();
  liblte_mme_pack_tracking_area_update_accept_msg(
      &taua, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 6, &out);
  show("TAU_ACCEPT");

  // ---- TAU Complete
  LIBLTE_MME_TRACKING_AREA_UPDATE_COMPLETE_MSG_STRUCT tauc;
  liblte_mme_pack_tracking_area_update_complete_msg(
      &tauc, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 8, &out);
  show("TAU_COMPLETE");

  // ---- TAU Reject
  LIBLTE_MME_TRACKING_AREA_UPDATE_REJECT_MSG_STRUCT taur;
  memset(&taur, 0, sizeof(taur));
  taur.emm_cause = 0x09;  // UE identity cannot be derived
  liblte_mme_pack_tracking_area_update_reject_msg(
      &taur, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
  show("TAU_REJECT");

  // ---- GUTI Reallocation Command
  LIBLTE_MME_GUTI_REALLOCATION_COMMAND_MSG_STRUCT grc;
  memset(&grc, 0, sizeof(grc));
  grc.guti = make_guti();
  grc.tai_list_present = true;
  grc.tai_list = make_tai_list();
  liblte_mme_pack_guti_reallocation_command_msg(
      &grc, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 9, &out);
  show("GUTI_REALLOCATION_COMMAND");

  // ---- GUTI Reallocation Complete
  LIBLTE_MME_GUTI_REALLOCATION_COMPLETE_MSG_STRUCT grcp;
  liblte_mme_pack_guti_reallocation_complete_msg(
      &grcp, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 10, &out);
  show("GUTI_REALLOCATION_COMPLETE");

  // ---- Downlink/Uplink NAS Transport (SMS container)
  LIBLTE_MME_DOWNLINK_NAS_TRANSPORT_MSG_STRUCT dnt;
  dnt.nas_msg.N_bytes = 4;
  dnt.nas_msg.msg[0] = 0xDE; dnt.nas_msg.msg[1] = 0xAD;
  dnt.nas_msg.msg[2] = 0xBE; dnt.nas_msg.msg[3] = 0xEF;
  liblte_mme_pack_downlink_nas_transport_msg(
      &dnt, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 11, &out);
  show("DL_NAS_TRANSPORT");

  LIBLTE_MME_UPLINK_NAS_TRANSPORT_MSG_STRUCT unt;
  unt.nas_msg = dnt.nas_msg;
  liblte_mme_pack_uplink_nas_transport_msg(
      &unt, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 12, &out);
  show("UL_NAS_TRANSPORT");

  // ---- security-protected wrapper around a plain EMM status
  LIBLTE_MME_EMM_STATUS_MSG_STRUCT es2;
  es2.emm_cause = 0x61;
  LIBLTE_BYTE_MSG_STRUCT plain;
  liblte_mme_pack_emm_status_msg(
      &es2, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &plain);
  liblte_mme_pack_security_protected_nas_msg(
      &plain, LIBLTE_MME_SECURITY_HDR_TYPE_INTEGRITY_AND_CIPHERED, 0x21, &out);
  show("SEC_PROTECTED_WRAPPER");

  return 0;
}
