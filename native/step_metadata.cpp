// Single-pass two-phase step metadata from the sorted id composite.
//
// Python computes comp[b] = np.sort((flat << idx_bits) | arange(K)) (numpy's
// sort is already near-optimal and releases the GIL); this kernel derives
// EVERYTHING ELSE in one linear pass per batch: inv / rep (logical
// first-occurrence metadata), pids / pinv / nuniq / prep (unique-physical-row
// slots), accperm + pruned residual lists + gdup lists (gather-route dedup),
// and the distinct-untouched-rows tail fill.  The numpy formulation needs
// ~10 full passes (sort, cumsums, ffill, take/put_along_axis, masked
// extractions) at ~4.6-6.4 ms per 65k-id batch — slower than the 2.5 ms
// device step it feeds (docs/perf_notes.md round 4b); this pass is
// L2-resident and runs batches on threads.
//
// Semantics mirror mmlrec_tpu/train/sparse_embedding.py::batch_step_metadata
// exactly (pinned by tests/test_sparse_embedding.py::test_native_step_
// metadata_matches_numpy); reference for the metadata contract:
// that function's docstring.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Per-batch residual / logical-dup counts (cap sizing pass).
void sm_counts(const int64_t* comp, int64_t steps, int64_t K,
               int32_t idx_bits, int32_t P,
               int64_t* n_resid, int64_t* n_ldup, int32_t n_threads) {
  auto work = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const int64_t* c = comp + b * K;
      int64_t prev_v = -1, prev_pv = -1;
      int64_t nres = 0, nld = 0;
      for (int64_t j = 0; j < K; ++j) {
        int64_t v = c[j] >> idx_bits;
        int64_t pv = P > 1 ? v / P : v;
        bool lnew = (j == 0) || (v != prev_v);
        bool pnew = (j == 0) || (pv != prev_pv);
        if (lnew && !pnew) ++nres;
        if (!lnew) ++nld;
        prev_v = v;
        prev_pv = pv;
      }
      n_resid[b] = nres;
      n_ldup[b] = nld;
    }
  };
  int64_t nt = n_threads < 1 ? 1 : n_threads;
  if (nt > steps) nt = steps;
  if (nt <= 1) { work(0, steps); return; }
  std::vector<std::thread> ts;
  int64_t per = (steps + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    int64_t b0 = t * per, b1 = b0 + per > steps ? steps : b0 + per;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& th : ts) th.join();
}

// Fill pass.  Caller allocates all outputs; route arrays must be
// pre-filled with their drop defaults (resid_slot = Kp, gdup_tgt = K,
// zeros elsewhere) — this writes only the real entries, plus the pids
// tail.  Pass R_cap = G_cap = 0 (null route pointers) to skip the route
// outputs.
void sm_fill(const int64_t* comp, int64_t steps, int64_t K,
             int32_t idx_bits, int32_t P, int64_t Kp,
             int64_t R_cap, int64_t G_cap,
             int32_t* inv, float* rep,
             int32_t* pids, int32_t* pinv, int32_t* nuniq, float* prep,
             int32_t* accperm, int32_t* resid_pos, int32_t* resid_slot,
             int32_t* gdup_pos, int32_t* gdup_tgt, int32_t n_threads) {
  const int64_t idx_mask = (int64_t(1) << idx_bits) - 1;
  auto work = [&](int64_t b0, int64_t b1) {
    // presence bitmap for the distinct-untouched-rows tail fill
    std::vector<uint8_t> present(size_t(Kp) + 1);
    for (int64_t b = b0; b < b1; ++b) {
      const int64_t* c = comp + b * K;
      int32_t* inv_b = inv + b * K;
      float* rep_b = rep + b * K;
      int32_t* pinv_b = pinv + b * K;
      float* prep_b = prep + b * K;
      int32_t* pids_b = pids + b * Kp;
      int32_t* acc_b = accperm ? accperm + b * Kp : nullptr;
      int32_t* rp_b = resid_pos ? resid_pos + b * R_cap : nullptr;
      int32_t* rs_b = resid_slot ? resid_slot + b * R_cap : nullptr;
      int32_t* gp_b = gdup_pos ? gdup_pos + b * G_cap : nullptr;
      int32_t* gt_b = gdup_tgt ? gdup_tgt + b * G_cap : nullptr;
      std::memset(present.data(), 0, present.size());
      int64_t prev_v = -1, prev_pv = -1;
      int64_t U = 0, nres = 0, nld = 0;
      int32_t cur_first = 0;
      for (int64_t j = 0; j < K; ++j) {
        int64_t comp_j = c[j];
        int32_t ob = int32_t(comp_j & idx_mask);
        int64_t v = comp_j >> idx_bits;
        int64_t pv = P > 1 ? v / P : v;
        bool lnew = (j == 0) || (v != prev_v);
        bool pnew = (j == 0) || (pv != prev_pv);
        if (pnew) {
          pids_b[U] = int32_t(pv);
          if (acc_b) acc_b[U] = ob;
          if (pv <= Kp) present[size_t(pv)] = 1;
          ++U;
        }
        if (lnew) cur_first = ob;
        inv_b[ob] = cur_first;
        rep_b[ob] = lnew ? 1.0f : 0.0f;
        pinv_b[ob] = int32_t(U - 1);
        prep_b[ob] = pnew ? 1.0f : 0.0f;
        if (lnew && !pnew && rp_b && nres < R_cap) {
          rp_b[nres] = ob;
          rs_b[nres] = int32_t(U - 1);
          ++nres;
        }
        if (!lnew && gp_b && nld < G_cap) {
          gp_b[nld] = ob;
          gt_b[nld] = cur_first;
          ++nld;
        }
        prev_v = v;
        prev_pv = pv;
      }
      nuniq[b] = int32_t(U);
      // distinct untouched rows at the tail: first non-members of pids
      // in [0, Kp] (same contract as the numpy path)
      int64_t need = Kp - U;
      for (int64_t r = 0; need > 0; ++r) {
        if (!present[size_t(r)]) {
          pids_b[U++] = int32_t(r);
          --need;
        }
      }
    }
  };
  int64_t nt = n_threads < 1 ? 1 : n_threads;
  if (nt > steps) nt = steps;
  if (nt <= 1) { work(0, steps); return; }
  std::vector<std::thread> ts;
  int64_t per = (steps + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    int64_t b0 = t * per, b1 = b0 + per > steps ? steps : b0 + per;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
