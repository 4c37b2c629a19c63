// Native symbolic-analysis kernels for baspacho_tpu.
//
// Host-side graph algorithms that dominate symbolic-analysis time on large
// problems, called from Python through ctypes (see baspacho_tpu/native.py):
//   * bs_amd_order           — approximate-minimum-degree fill-reducing
//                              ordering (quotient graph, element
//                              absorption, AMD-style approximate external
//                              degrees, supervariable hashing)
//   * bs_full_elim_fill_*    — full symbolic Cholesky fill (elimination
//                              tree row-pattern enumeration, two-pass)
//   * bs_build_etree         — elimination tree + per-node row statistics
//
// All structures are block-level lower-half CSR: inds[ptrs[k]:ptrs[k+1]]
// hold the column ids (<= k) of row k. Entries with col > row are ignored.
//
// Build: make -C native   (produces libbaspacho_symbolic.so)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

using std::vector;
typedef int64_t i64;

extern "C" {

static i64 pairs_to_csr(i64 order, i64 nnz, const i64* rows, const i64* cols,
                        int dedup, int sort_cols, i64* out_ptrs,
                        i64* out_inds);

// ---------------------------------------------------------------------------
// elimination tree (Liu's algorithm with path compression) + row stats
// ---------------------------------------------------------------------------
int bs_build_etree(i64 n, const i64* ptrs, const i64* inds,
                   const i64* param_size, i64* parent_out, i64* node_rows,
                   i64* node_row_blocks) {
  vector<i64> ancestor(n, -1);
  for (i64 k = 0; k < n; k++) parent_out[k] = -1;
  for (i64 k = 0; k < n; k++) {
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      i64 i = inds[q];
      if (i >= k) continue;
      while (i != k) {
        i64 a = ancestor[i];
        ancestor[i] = k;
        if (a == -1) { parent_out[i] = k; break; }
        if (a == k) break;
        i = a;
      }
    }
  }
  // row stats need the actual fill pattern: per column i, every k>i with
  // L(k,i) != 0 contributes param_size[k] rows; enumerate via tag walks
  vector<i64> tags(n, -1), par(parent_out, parent_out + n);
  for (i64 k = 0; k < n; k++) {
    tags[k] = k;
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      i64 i = inds[q];
      if (i >= k) continue;
      while (tags[i] != k) {
        tags[i] = k;
        node_rows[i] += param_size[k];
        node_row_blocks[i] += 1;
        i = par[i];
        if (i < 0) break;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// full symbolic Cholesky fill: row k's pattern = nodes reachable in the
// etree from entries of A(k, 0:k) stopping at visited nodes
// ---------------------------------------------------------------------------
static void fill_pass(i64 n, const i64* ptrs, const i64* inds,
                      i64* counts, i64* out_ptrs, i64* out_inds) {
  vector<i64> parent(n, -1), tags(n, -1);
  vector<i64> cursor;
  if (out_inds) cursor.assign(out_ptrs, out_ptrs + n);
  for (i64 k = 0; k < n; k++) {
    parent[k] = -1;
    tags[k] = k;
    if (counts) counts[k] = 1;
    if (out_inds) out_inds[cursor[k]++] = k;
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      i64 i = inds[q];
      if (i >= k) continue;
      while (tags[i] != k) {
        if (parent[i] == -1) parent[i] = k;
        tags[i] = k;
        if (counts) counts[k]++;
        if (out_inds) out_inds[cursor[k]++] = i;
        i = parent[i];
      }
    }
    if (out_inds) std::sort(out_inds + out_ptrs[k], out_inds + cursor[k]);
  }
}

// ---------------------------------------------------------------------------
// independent-elimination fill: eliminating block-columns [start, end) (an
// independent set) connects every pair of rows sharing a column in the
// range. Result = original entries + diagonal + all (hi, lo) pairs with
// hi >= end, deduped, per-row sorted. Mirrors the Python
// SparseStructure.add_independent_elimination_fill (itself matching
// reference SparseStructure.cpp:161-222) but runs the pair enumeration +
// sort-unique in C++ — the Python/numpy version costs ~25 s at
// 527k-landmark BAL scale.
// Two-call protocol: _count computes everything and caches the result;
// _fill copies it out and releases the cache (single-threaded use).
// ---------------------------------------------------------------------------
static vector<i64> g_indep_inds;

i64 bs_indep_elim_fill_count(i64 n, const i64* ptrs, const i64* inds,
                             i64 start, i64 end, i64* out_ptrs) {
  if (start < 0 || end < start || end > n) return -1;
  i64 nnz = ptrs[n];
  // column lists of the elim range (rows > col)
  vector<i64> ccount(end - start, 0);
  for (i64 k = 0; k < n; k++)
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      i64 c = inds[q];
      if (c >= start && c < end && k > c) ccount[c - start]++;
    }
  vector<i64> cptr(end - start + 1, 0);
  for (i64 c = 0; c < end - start; c++) cptr[c + 1] = cptr[c] + ccount[c];
  vector<i64> crows(cptr[end - start]);
  {
    vector<i64> cur(cptr.begin(), cptr.end() - 1);
    for (i64 k = 0; k < n; k++)
      for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
        i64 c = inds[q];
        if (c >= start && c < end && k > c) crows[cur[c - start]++] = k;
      }
  }
  // exact pair count (each column's row list is ascending, so rows >=
  // end form a suffix): kept pairs = C(m,2) - C(m_below_end,2)
  i64 npairs = 0;
  for (i64 c = 0; c < end - start; c++) {
    i64 a = cptr[c], b = cptr[c + 1], m = b - a;
    i64 s = 0;
    while (a + s < b && crows[a + s] < end) s++;
    npairs += m * (m - 1) / 2 - s * (s - 1) / 2;
  }
  i64 tot_in = nnz + n + npairs;
  vector<i64> prows, pcols;
  prows.reserve(tot_in);
  pcols.reserve(tot_in);
  for (i64 k = 0; k < n; k++) {
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      prows.push_back(k);
      pcols.push_back(inds[q]);
    }
    prows.push_back(k);  // diagonal
    pcols.push_back(k);
  }
  for (i64 c = 0; c < end - start; c++) {
    i64 a = cptr[c], b = cptr[c + 1];
    for (i64 i = a; i < b; i++)
      for (i64 j = i + 1; j < b; j++) {
        i64 hi = crows[i], lo = crows[j];
        if (hi < lo) std::swap(hi, lo);
        if (hi >= end) {
          prows.push_back(hi);
          pcols.push_back(lo);
        }
      }
  }
  // sort + dedup via the two-pass radix CSR builder (std::sort on packed
  // r*n+c keys cost ~1s at 10M entries; radix is O(nnz))
  g_indep_inds.resize(tot_in);
  i64 m = pairs_to_csr(n, tot_in, prows.data(), pcols.data(), 1, 1,
                       out_ptrs, g_indep_inds.data());
  g_indep_inds.resize(m);
  return m;
}

int bs_indep_elim_fill_fill(i64 total, i64* out_inds) {
  if ((i64)g_indep_inds.size() != total) return -1;
  std::memcpy(out_inds, g_indep_inds.data(), total * sizeof(i64));
  g_indep_inds.clear();
  g_indep_inds.shrink_to_fit();
  return 0;
}

i64 bs_full_elim_fill_count(i64 n, const i64* ptrs, const i64* inds,
                            i64* out_ptrs) {
  vector<i64> counts(n, 0);
  fill_pass(n, ptrs, inds, counts.data(), nullptr, nullptr);
  i64 tot = 0;
  for (i64 k = 0; k < n; k++) { out_ptrs[k] = tot; tot += counts[k]; }
  out_ptrs[n] = tot;
  return tot;
}

int bs_full_elim_fill_fill(i64 n, const i64* ptrs, const i64* inds,
                           const i64* out_ptrs, i64* out_inds) {
  fill_pass(n, ptrs, inds, nullptr, const_cast<i64*>(out_ptrs), out_inds);
  return 0;
}

// ---------------------------------------------------------------------------
// approximate minimum degree ordering (quotient graph)
// ---------------------------------------------------------------------------
// Design: classic AMD machinery —
//   variables hold a plain-neighbor list A_v and an adjacent-element list
//   E_v; eliminating pivot p turns it into element p with boundary
//   L_p = (A_p U union of its elements' boundaries) minus eliminated;
//   adjacent elements are absorbed; per-variable degrees are approximated
//   with the standard w-counter trick: after forming L_p,
//     d_v ~= |A_v \ L_p| + |L_p|-1 + sum_{e in E_v, e != p} |L_e \ L_p|
//   where each |L_e \ L_p| comes from one shared counting sweep.
//   Indistinguishable variables (same hash of A_v+E_v, verified exactly)
//   are merged into supervariables.
// This is an independent implementation of the published algorithm
// (Amestoy–Davis–Duff, SIAM J. Matrix Anal. 1996).
int bs_amd_order(i64 n, const i64* ptrs, const i64* inds, i64* perm_out) {
  if (n == 0) return 0;
  // symmetrized adjacency without self-loops
  vector<vector<i64>> adj(n);
  for (i64 k = 0; k < n; k++)
    for (i64 q = ptrs[k]; q < ptrs[k + 1]; q++) {
      i64 j = inds[q];
      if (j == k || j >= n) continue;
      adj[k].push_back(j);
      adj[j].push_back(k);
    }
  for (i64 v = 0; v < n; v++) {
    auto& a = adj[v];
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
  }

  vector<vector<i64>> elems(n);        // elements adjacent to variable
  vector<vector<i64>> evars(n);        // element id -> boundary supervars
  vector<i64> degree(n), nv(n, 1);     // supervariable sizes
  vector<char> alive(n, 1), is_elem(n, 0);
  vector<i64> w(n, -1), wstamp(n, 0);  // per-pivot counters
  vector<i64> lp_mark(n, 0);           // membership stamp for L_p
  vector<i64> merged_into(n, -1);
  i64 stamp = 0;

  for (i64 v = 0; v < n; v++) degree[v] = (i64)adj[v].size();

  // simple bucketed min-degree selection
  i64 mindeg = 0;
  vector<vector<i64>> buckets(n + 1);
  vector<i64> bucket_of(n);
  for (i64 v = 0; v < n; v++) {
    i64 d = std::min<i64>(degree[v], n);
    buckets[d].push_back(v);
    bucket_of[v] = d;
  }

  auto requeue = [&](i64 v) {
    i64 d = std::min<i64>(degree[v], n);
    buckets[d].push_back(v);
    bucket_of[v] = d;
    if (d < mindeg) mindeg = d;
  };

  i64 pos = 0;
  vector<i64> pivot_order;
  pivot_order.reserve(n);
  vector<i64> lp;  // pivot boundary (supervariables)
  while (pos < n) {
    // pick min-degree alive supervariable (lazy buckets)
    i64 p = -1;
    while (mindeg <= n) {
      auto& b = buckets[mindeg];
      while (!b.empty()) {
        i64 v = b.back();
        if (alive[v] && !is_elem[v] && bucket_of[v] == mindeg &&
            std::min<i64>(degree[v], n) == mindeg) { p = v; break; }
        b.pop_back();
      }
      if (p != -1) { buckets[mindeg].pop_back(); break; }
      mindeg++;
    }
    if (p == -1) break;  // should not happen

    // eliminate p (its merged members are expanded at the end)
    alive[p] = 0;
    is_elem[p] = 1;
    pivot_order.push_back(p);
    pos += nv[p];

    // boundary L_p
    stamp++;
    lp.clear();
    for (i64 u : adj[p])
      if (alive[u] && lp_mark[u] != stamp) { lp_mark[u] = stamp; lp.push_back(u); }
    for (i64 e : elems[p]) {
      for (i64 u : evars[e])
        if (alive[u] && lp_mark[u] != stamp) { lp_mark[u] = stamp; lp.push_back(u); }
    }

    i64 lp_size = 0;
    for (i64 u : lp) lp_size += nv[u];

    // w-counter sweep: |L_e \ L_p| for every element touching L_p
    for (i64 u : lp)
      for (i64 e : elems[u])
        if (wstamp[e] != stamp) {
          wstamp[e] = stamp;
          i64 sz = 0;
          for (i64 x : evars[e]) if (alive[x]) sz += nv[x];
          w[e] = sz;
        }
    for (i64 u : lp)
      for (i64 e : elems[u])
        if (wstamp[e] == stamp) w[e] -= nv[u];

    // absorb p's elements; p becomes the new element with boundary lp
    for (i64 e : elems[p]) { evars[e].clear(); evars[e].shrink_to_fit(); is_elem[e] = 2; }
    evars[p] = lp;

    // update each boundary variable
    for (i64 u : lp) {
      // strip A_u of L_p members and of p itself; drop dead entries
      auto& au = adj[u];
      i64 keep = 0, a_deg = 0;
      for (i64 x : au) {
        if (!alive[x] || lp_mark[x] == stamp || x == p) continue;
        au[keep++] = x;
        a_deg += nv[x];
      }
      au.resize(keep);
      // keep only live elements (absorbed ones dropped), add p
      auto& eu = elems[u];
      i64 ekeep = 0;
      i64 outer = 0;
      for (i64 e : eu) {
        if (is_elem[e] != 1 || evars[e].empty()) continue;
        if (e == p) continue;
        eu[ekeep++] = e;
        outer += (wstamp[e] == stamp && w[e] >= 0) ? w[e] : 0;
      }
      eu.resize(ekeep);
      eu.push_back(p);
      degree[u] = a_deg + (lp_size - nv[u]) + outer;
      requeue(u);
    }

    // supervariable detection: hash boundary vars by (A_u, E_u)
    // cheap version: group by (|A_u|, |E_u|, sum) then verify exactly
    if (lp.size() > 1) {
      vector<std::pair<i64, i64>> hashes;
      hashes.reserve(lp.size());
      for (i64 u : lp) {
        i64 h = 1469598103934665603LL;
        for (i64 x : adj[u]) h = (h ^ x) * 1099511628211LL;
        for (i64 e : elems[u]) h = (h ^ (e + n)) * 1099511628211LL;
        hashes.push_back({h, u});
      }
      std::sort(hashes.begin(), hashes.end());
      for (size_t a = 0; a + 1 < hashes.size(); a++) {
        if (hashes[a].first != hashes[a + 1].first) continue;
        i64 u = hashes[a].second, v2 = hashes[a + 1].second;
        if (!alive[u] || !alive[v2]) continue;
        if (adj[u] != adj[v2] || elems[u] != elems[v2]) continue;
        // merge v2 into u
        alive[v2] = 0;
        merged_into[v2] = u;
        nv[u] += nv[v2];
        degree[u] -= nv[v2];
        hashes[a + 1].second = u;
        requeue(u);
      }
    }
  }

  // expand supervariables: each pivot emits itself plus every variable
  // merged (transitively) into it, in index order
  {
    vector<vector<i64>> members(n);
    for (i64 v = 0; v < n; v++) {
      i64 m = v;
      while (merged_into[m] != -1) m = merged_into[m];
      members[m].push_back(v);
    }
    i64 out = 0;
    for (i64 pvt : pivot_order) {
      std::sort(members[pvt].begin(), members[pvt].end());
      for (i64 x : members[pvt]) perm_out[out++] = x;
    }
    if (out != n) return 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// level schedule: level(l) = 1 + max level over the earlier columns that
// update l (its row-boards' origins) — sequential loop-carried recurrence
// the Python side can't vectorize.
// ---------------------------------------------------------------------------
int bs_level_schedule(i64 n, const i64* board_row_ptr,
                      const i64* board_col_lump, i64 max_factor_lump,
                      i64* levels_out) {
  for (i64 l = 0; l < n; l++) {
    i64 lv = 0;
    for (i64 r = board_row_ptr[l]; r < board_row_ptr[l + 1]; r++) {
      i64 o = board_col_lump[r];
      if (o < l && o < max_factor_lump && levels_out[o] + 1 > lv)
        lv = levels_out[o] + 1;
    }
    levels_out[l] = lv;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CSR construction from (row, col) pairs via stable LSD radix sort —
// two O(nnz) counting passes (by col, then by row) replace numpy's
// O(nnz log nnz) lexsort/unique in SparseStructure._csr_from_pairs.
// dedup=1 drops duplicate (row, col) pairs after sorting; sort_cols=0
// groups by row only (stable, preserving within-row input order).
// Returns the output entry count.
// ---------------------------------------------------------------------------
static void radix_pass(i64 n, i64 nbuckets, const i64* key, const i64* in_idx,
                       i64* out_idx, vector<i64>& cnt) {
  cnt.assign(nbuckets + 1, 0);
  if (in_idx) {
    for (i64 i = 0; i < n; i++) cnt[key[in_idx[i]] + 1]++;
    for (i64 b = 0; b < nbuckets; b++) cnt[b + 1] += cnt[b];
    for (i64 i = 0; i < n; i++) out_idx[cnt[key[in_idx[i]]]++] = in_idx[i];
  } else {
    for (i64 i = 0; i < n; i++) cnt[key[i] + 1]++;
    for (i64 b = 0; b < nbuckets; b++) cnt[b + 1] += cnt[b];
    for (i64 i = 0; i < n; i++) out_idx[cnt[key[i]]++] = i;
  }
}

static i64 pairs_to_csr(i64 order, i64 nnz, const i64* rows, const i64* cols,
                        int dedup, int sort_cols, i64* out_ptrs,
                        i64* out_inds) {
  vector<i64> a(nnz), b(nnz), cnt;
  i64* perm = a.data();
  if (sort_cols) {
    radix_pass(nnz, order, cols, nullptr, b.data(), cnt);
    radix_pass(nnz, order, rows, b.data(), a.data(), cnt);
  } else {
    radix_pass(nnz, order, rows, nullptr, a.data(), cnt);
  }
  i64 m = 0;
  i64 prev_r = -1, prev_c = -1;
  std::fill(out_ptrs, out_ptrs + order + 1, 0);
  for (i64 i = 0; i < nnz; i++) {
    i64 r = rows[perm[i]], c = cols[perm[i]];
    if (dedup && r == prev_r && c == prev_c) continue;
    out_inds[m++] = c;
    out_ptrs[r + 1]++;
    prev_r = r;
    prev_c = c;
  }
  for (i64 k = 0; k < order; k++) out_ptrs[k + 1] += out_ptrs[k];
  return m;
}

i64 bs_pairs_to_csr(i64 order, i64 nnz, const i64* rows, const i64* cols,
                    i64 dedup, i64 sort_cols, i64* out_ptrs, i64* out_inds) {
  return pairs_to_csr(order, nnz, rows, cols, (int)dedup, (int)sort_cols,
                      out_ptrs, out_inds);
}

// symmetric permutation: relabel through map_perm, fold into the requested
// half, rebuild CSR (SparseStructure::symmetricPermutation counterpart).
i64 bs_sym_perm(i64 order, const i64* ptrs, const i64* inds,
                const i64* map_perm, i64 lower_half, i64 sort_cols,
                i64* out_ptrs, i64* out_inds) {
  i64 nnz = ptrs[order];
  vector<i64> rows(nnz), cols(nnz);
  for (i64 r = 0; r < order; r++) {
    i64 nr = map_perm[r];
    for (i64 q = ptrs[r]; q < ptrs[r + 1]; q++) {
      i64 nc = map_perm[inds[q]];
      i64 hi = nr > nc ? nr : nc, lo = nr > nc ? nc : nr;
      if (lower_half) {
        rows[q] = hi;
        cols[q] = lo;
      } else {
        rows[q] = lo;
        cols[q] = hi;
      }
    }
  }
  return pairs_to_csr(order, nnz, rows.data(), cols.data(), 0,
                      (int)sort_cols, out_ptrs, out_inds);
}

// transpose with per-row sorted output (counting sort by column).
int bs_transpose(i64 order, const i64* ptrs, const i64* inds, i64* out_ptrs,
                 i64* out_inds) {
  i64 nnz = ptrs[order];
  std::fill(out_ptrs, out_ptrs + order + 1, 0);
  for (i64 q = 0; q < nnz; q++) out_ptrs[inds[q] + 1]++;
  for (i64 k = 0; k < order; k++) out_ptrs[k + 1] += out_ptrs[k];
  vector<i64> cur(out_ptrs, out_ptrs + order);
  for (i64 r = 0; r < order; r++)
    for (i64 q = ptrs[r]; q < ptrs[r + 1]; q++) out_inds[cur[inds[q]]++] = r;
  return 0;
}

// ---------------------------------------------------------------------------
// coalesced block-matrix skeleton construction (CoalescedBlockMatrixSkel
// counterpart of the reference CoalescedBlockMatrix.cpp:17-122) — a dozen
// O(nnz) passes that cost seconds as numpy fancy-indexing at BAL scale.
//
// Phase 1 (padding-independent): span/lump maps, per-chain cumulative
// rows, per-column below rows, and both board orderings. Board arrays
// must be allocated with nchains + num_lumps (col-ordered, incl. one
// sentinel per column) / nchains (row-ordered) entries; returns the
// total number of boards (runs + sentinels), or -1 on invalid input
// (the Python constructor's validation asserts).
// ---------------------------------------------------------------------------
i64 bs_skel_build(i64 num_spans, i64 num_lumps, const i64* span_start,
                  const i64* lump_to_span, const i64* col_ptr,
                  const i64* row_ind, i64* span_to_lump, i64* lump_start,
                  i64* span_offset_in_lump, i64* chain_rows_till_end,
                  i64* below_rows, i64* board_col_ptr, i64* board_row_lump,
                  i64* board_chain_col_ord, i64* board_row_ptr,
                  i64* board_col_lump, i64* board_col_ord) {
  i64 tot_size = span_start[num_spans];
  for (i64 l = 0; l < num_lumps; l++)
    for (i64 s = lump_to_span[l]; s < lump_to_span[l + 1]; s++)
      span_to_lump[s] = l;
  span_to_lump[num_spans] = num_lumps;
  for (i64 l = 0; l < num_lumps; l++)
    lump_start[l] = span_start[lump_to_span[l]];
  lump_start[num_lumps] = tot_size;
  for (i64 s = 0; s < num_spans; s++)
    span_offset_in_lump[s] = span_start[s] - lump_start[span_to_lump[s]];
  span_offset_in_lump[num_spans] = 0;

  // first pass: validate, chain cumulative rows, below rows, board counts
  vector<i64> row_count(num_lumps, 0);  // boards per row lump (no sentinels)
  i64 nruns = 0;
  for (i64 l = 0; l < num_lumps; l++) {
    i64 c0 = col_ptr[l], c1 = col_ptr[l + 1];
    i64 s0 = lump_to_span[l], s1 = lump_to_span[l + 1];
    i64 nd = s1 - s0;
    if (c1 - c0 < nd) return -1;
    for (i64 j = 0; j < nd; j++)
      if (row_ind[c0 + j] != s0 + j) return -1;
    i64 rows = 0, prev = -1, prev_rl = -1;
    for (i64 c = c0; c < c1; c++) {
      i64 s = row_ind[c];
      if (s <= prev || s >= num_spans) return -1;
      prev = s;
      rows += span_start[s + 1] - span_start[s];
      chain_rows_till_end[c] = rows;
      i64 rl = span_to_lump[s];
      if (rl != prev_rl) {
        row_count[rl]++;
        nruns++;
        prev_rl = rl;
      }
    }
    below_rows[l] = rows - (lump_start[l + 1] - lump_start[l]);
  }
  // second pass: column-ordered boards (+ per-column sentinel) and
  // row-ordered boards via counting sort (stable in column order)
  board_row_ptr[0] = 0;
  for (i64 l = 0; l < num_lumps; l++)
    board_row_ptr[l + 1] = board_row_ptr[l] + row_count[l];
  vector<i64> cursor(board_row_ptr, board_row_ptr + num_lumps);
  i64 bpos = 0;
  for (i64 l = 0; l < num_lumps; l++) {
    board_col_ptr[l] = bpos;
    i64 c0 = col_ptr[l], c1 = col_ptr[l + 1];
    i64 prev_rl = -1, ord = 0;
    for (i64 c = c0; c < c1; c++) {
      i64 rl = span_to_lump[row_ind[c]];
      if (rl != prev_rl) {
        board_row_lump[bpos] = rl;
        board_chain_col_ord[bpos] = c - c0;
        i64 q = cursor[rl]++;
        board_col_lump[q] = l;
        board_col_ord[q] = ord;
        bpos++;
        ord++;
        prev_rl = rl;
      }
    }
    board_row_lump[bpos] = -1;  // sentinel
    board_chain_col_ord[bpos] = c1 - c0;
    bpos++;
  }
  board_col_ptr[num_lumps] = bpos;
  return bpos;
}

// Below-row RHS index expansion for the numeric plan (build_plan): for
// every lump, the global RHS row index of each of its below-diagonal
// panel rows, concatenated, with per-lump extents. int32 output (the
// largest plan temporary at BAL scale).
int bs_plan_below_rows(i64 num_lumps, const i64* span_start,
                       const i64* lump_to_span, const i64* col_ptr,
                       const i64* row_ind, int32_t* global_rows,
                       i64* lump_row_ptr) {
  i64 m = 0;
  lump_row_ptr[0] = 0;
  for (i64 l = 0; l < num_lumps; l++) {
    i64 nd = lump_to_span[l + 1] - lump_to_span[l];
    for (i64 c = col_ptr[l] + nd; c < col_ptr[l + 1]; c++) {
      i64 s = row_ind[c];
      for (i64 r = span_start[s]; r < span_start[s + 1]; r++)
        global_rows[m++] = (int32_t)r;
    }
    lump_row_ptr[l + 1] = m;
  }
  return 0;
}

// Vectorized permuted-accessor block lookup (Accessor.h:145-181 analog,
// batch form): for each queried (row_index, col_index) user pair, apply
// the permutation, order the pair into the lower half, binary-search the
// column lump's chain list for the row span, and emit (flat offset,
// panel stride, flip). Returns -1 if any block is absent.
int bs_perm_block_offsets(
    i64 nq, const i64* row_idx, const i64* col_idx, const i64* perm,
    const i64* span_to_lump, const i64* col_stride,
    const i64* span_offset_in_lump, const i64* chain_col_ptr,
    const i64* chain_row_span, const i64* chain_data,
    i64* off_out, i64* stride_out, uint8_t* flip_out) {
  for (i64 q = 0; q < nq; q++) {
    i64 pr = perm ? perm[row_idx[q]] : row_idx[q];
    i64 pc = perm ? perm[col_idx[q]] : col_idx[q];
    i64 hi = pr > pc ? pr : pc, lo = pr > pc ? pc : pr;
    i64 l = span_to_lump[lo];
    const i64* b = chain_row_span + chain_col_ptr[l];
    const i64* e = chain_row_span + chain_col_ptr[l + 1];
    const i64* p = std::lower_bound(b, e, hi);
    if (p == e || *p != hi) return -1;
    i64 pos = chain_col_ptr[l] + (p - b);
    off_out[q] = chain_data[pos] + span_offset_in_lump[lo];
    stride_out[q] = col_stride[l];
    flip_out[q] = (uint8_t)(pr < pc);
  }
  return 0;
}

// Phase 2: per-chain flat data offsets given the padded panel geometry
// (panel_base, col_stride come from the Python-side pad policy).
int bs_skel_chain_data(i64 num_lumps, const i64* span_start,
                       const i64* lump_start, const i64* col_ptr,
                       const i64* row_ind, const i64* chain_rows_till_end,
                       const i64* col_stride, const i64* panel_base,
                       i64* chain_data) {
  for (i64 l = 0; l < num_lumps; l++) {
    i64 base = panel_base[l], st = col_stride[l];
    i64 w = lump_start[l + 1] - lump_start[l];
    for (i64 c = col_ptr[l]; c < col_ptr[l + 1]; c++) {
      i64 s = row_ind[c];
      i64 row_start = chain_rows_till_end[c] -
                      (span_start[s + 1] - span_start[s]);
      i64 prow = row_start < w ? row_start : st + row_start - w;
      chain_data[c] = base + prow * st;
    }
  }
  chain_data[col_ptr[num_lumps]] = panel_base[num_lumps];
  return 0;
}

// ---------------------------------------------------------------------------
// greedy cost-model supernode merging (the hot loop of EliminationTree's
// processTree; ~1e6 cost evaluations, dominated symbolic time in Python).
// Mirrors elimination_tree.py::compute_merges exactly, including heap
// tie-breaking (max (score, k, p) lexicographic == Python heapq on
// (-score, -k, -p)).
//
// csc_ptrs/csc_rows: FILLED pattern as CSC of the lower half (per column:
// rows >= col, sorted ascending, diagonal first).
// ---------------------------------------------------------------------------
i64 bs_compute_merges(i64 n, const i64* csc_ptrs, const i64* csc_rows,
                      const i64* psize, const i64* parent,
                      i64* node_size, const i64* node_rows,
                      const i64* node_row_blocks, const i64* forbid_merge,
                      double* syge_costs, double* asmbl_costs,
                      const double* pp, const double* tp, const double* sp,
                      const double* ap, i64 max_supernode_size,
                      i64* merge_with, i64* num_merged) {
  // --- per-row stats: entries [col, blocks, rows, blocks_down, rows_down]
  struct Stat { i64 c, b, r, bd, rd; };
  vector<vector<Stat>> prs(n);
  {
    vector<i64> cnt(n, 0);
    for (i64 e = 0; e < csc_ptrs[n]; e++) cnt[csc_rows[e]]++;
    for (i64 r = 0; r < n; r++) prs[r].reserve(cnt[r]);
  }
  for (i64 c = 0; c < n; c++) {
    i64 e0 = csc_ptrs[c], e1 = csc_ptrs[c + 1];
    // suffix sums of row sizes below each entry
    i64 rows_down = 0;
    vector<i64> rd(e1 - e0);
    for (i64 e = e1 - 1; e >= e0; e--) {
      rd[e - e0] = rows_down;
      rows_down += psize[csc_rows[e]];
    }
    for (i64 e = e0; e < e1; e++) {
      i64 r = csc_rows[e];
      prs[r].push_back({c, 1, psize[r], (e1 - 1) - e, rd[e - e0]});
    }
  }

  auto syge_lin = [&](double m, double w, double* out01) {
    double u = m + w, v = m * w;
    out01[0] = sp[0] + u * sp[1] + v * sp[2];
    out01[1] = sp[3] + u * sp[4] + v * sp[5];
  };
  auto asmbl_lin = [&](double br, double* out01) {
    out01[0] = ap[0] + br * ap[1];
    out01[1] = ap[2] + br * ap[3];
  };
  auto potrf = [&](double w) {
    return pp[0] + w * (pp[1] + w * (pp[2] + w * pp[3]));
  };
  auto trsm = [&](double w, double k) {
    return tp[0] + w * (tp[1] + w * tp[2]) +
           k * (tp[3] + w * (tp[4] + w * tp[5]));
  };
  auto pick_score = [&](i64 k, i64 p) {
    return (double)node_rows[k] / (double)(node_rows[p] + node_size[p]);
  };

  // max-heap on (score, k, p) — matches Python heapq((-s, -k, -p))
  struct HeapEnt {
    double s; i64 k, p;
    bool operator<(const HeapEnt& o) const {
      if (s != o.s) return s < o.s;
      if (k != o.k) return k < o.k;
      return p < o.p;
    }
  };
  vector<HeapEnt> heap;
  heap.reserve(n);
  for (i64 k = 0; k < n; k++) {
    merge_with[k] = -1;
    num_merged[k] = 1;
    if (forbid_merge[k]) continue;
    i64 p = parent[k];
    if (p == -1) continue;
    heap.push_back({pick_score(k, p), k, p});
  }
  std::make_heap(heap.begin(), heap.end());

  i64 num_merges = 0;
  double d[2];
  while (!heap.empty()) {
    std::pop_heap(heap.begin(), heap.end());
    HeapEnt e = heap.back();
    heap.pop_back();
    i64 k = e.k, p = e.p, old_p = p;
    while (merge_with[p] != -1) p = merge_with[p];
    if (old_p != p) {  // stale: parent got merged, re-score
      heap.push_back({pick_score(k, p), k, p});
      std::push_heap(heap.begin(), heap.end());
      continue;
    }
    double sk = (double)node_size[k], rk = (double)node_rows[k];
    double sp_ = (double)node_size[p], rp = (double)node_rows[p];
    double sm = sp_ + sk;
    if (sm > (double)max_supernode_size) continue;
    double* sgk = syge_costs + 2 * k;
    double* sgp = syge_costs + 2 * p;
    double* ask = asmbl_costs + 2 * k;
    double* asp = asmbl_costs + 2 * p;
    double t_k = potrf(sk) + trsm(sk, rk) + sgk[0] + sgk[1] * sk +
                 ask[0] + ask[1] * (double)num_merged[k];
    double t_p = potrf(sp_) + trsm(sp_, rp) + sgp[0] + sgp[1] * sp_ +
                 asp[0] + asp[1] * (double)num_merged[p];
    double t_m = potrf(sm) + trsm(sm, rp) + sgp[0] + sgp[1] * sm +
                 asp[0] +
                 asp[1] * (double)(num_merged[k] + num_merged[p]);
    if (!(t_m < t_k + t_p)) continue;

    i64 prev_size_p = node_size[p];
    i64 prev_merged_p = num_merged[p];
    merge_with[k] = p;
    node_size[p] += node_size[k];
    num_merged[p] += num_merged[k];
    num_merges++;

    // merge row-stat lists; where both appear in one column the two row
    // blocks become one taller block — update that column's accumulators
    vector<Stat>& k_rd = prs[k];
    vector<Stat>& p_rd = prs[p];
    vector<Stat> merged;
    merged.reserve(k_rd.size() + p_rd.size());
    size_t ik = 0, ip = 0;
    while (ik < k_rd.size() || ip < p_rd.size()) {
      if (ip >= p_rd.size() ||
          (ik < k_rd.size() && k_rd[ik].c < p_rd[ip].c)) {
        if (k_rd[ik].c != k) merged.push_back(k_rd[ik]);
        ik++;
      } else if (ik >= k_rd.size() || k_rd[ik].c > p_rd[ip].c) {
        if (p_rd[ip].c != p) merged.push_back(p_rd[ip]);
        ip++;
      } else {
        const Stat& ks = k_rd[ik];
        const Stat& ps = p_rd[ip];
        i64 c = ks.c;
        double* s01 = syge_costs + 2 * c;
        double* a01 = asmbl_costs + 2 * c;
        syge_lin((double)(ks.rd + ks.r), (double)ks.r, d);
        s01[0] -= d[0]; s01[1] -= d[1];
        asmbl_lin((double)(ks.bd + ks.b), d);
        a01[0] -= d[0]; a01[1] -= d[1];
        syge_lin((double)(ps.rd + ps.r), (double)ps.r, d);
        s01[0] -= d[0]; s01[1] -= d[1];
        asmbl_lin((double)(ps.bd + ps.b), d);
        a01[0] -= d[0]; a01[1] -= d[1];
        syge_lin((double)(ps.rd + ks.r + ps.r), (double)(ks.r + ps.r), d);
        s01[0] += d[0]; s01[1] += d[1];
        asmbl_lin((double)(ps.bd + ks.b + ps.b), d);
        a01[0] += d[0]; a01[1] += d[1];
        merged.push_back({c, ks.b + ps.b, ks.r + ps.r, ps.bd, ps.rd});
        ik++;
        ip++;
      }
    }
    double* s01 = syge_costs + 2 * p;
    double* a01 = asmbl_costs + 2 * p;
    syge_lin((double)(node_rows[p] + prev_size_p), (double)prev_size_p, d);
    s01[0] -= d[0]; s01[1] -= d[1];
    asmbl_lin((double)(node_row_blocks[p] + prev_merged_p), d);
    a01[0] -= d[0]; a01[1] -= d[1];
    syge_lin((double)(node_rows[p] + node_size[p]),
             (double)node_size[p], d);
    s01[0] += d[0]; s01[1] += d[1];
    asmbl_lin((double)(node_row_blocks[p] + num_merged[p]), d);
    a01[0] += d[0]; a01[1] += d[1];
    merged.push_back({p, num_merged[p], node_size[p],
                      node_row_blocks[p], node_rows[p]});
    prs[p] = std::move(merged);
  }
  return num_merges;
}

}  // extern "C"
