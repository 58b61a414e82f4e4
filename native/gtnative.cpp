// gtnative: host-side sequential kernels for genometools_tpu.
//
// The TPU device side is purely data-parallel (sort/scan/histogram/DP in
// JAX/Pallas); the traversals that are sequential-by-nature — bottom-up
// lcp-interval stack walks (capability equivalent of the reference
// esa-bottomup engine, ref: src/match/esa-bottomup.c:116) and Kasai's LCP
// (ref: src/match/sfx-linlcp.c:31) — run here over device-produced arrays.
//
// Plain C ABI, loaded via ctypes. All buffers are caller-owned numpy
// arrays except the growable outputs, which are malloc'd here and released
// with gt_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

void gt_free(void *p) { free(p); }

// ---------------------------------------------------------------------------
// Kasai 13n LCP construction from keys + suffix array.
// keys: int32[n1] (unique-special suffix keys); sa: int32[n1]; out lcp[n1].
// ---------------------------------------------------------------------------
void gt_kasai_lcp(const int32_t *keys, const int32_t *sa, int64_t n1,
                  int32_t *lcp) {
  std::vector<int64_t> rank(n1);
  for (int64_t i = 0; i < n1; i++) rank[sa[i]] = i;
  int64_t h = 0;
  for (int64_t i = 0; i < n1; i++) {
    int64_t r = rank[i];
    if (r > 0) {
      int64_t j = sa[r - 1];
      while (i + h < n1 && j + h < n1 && keys[i + h] == keys[j + h]) h++;
      lcp[r] = (int32_t)h;
      if (h > 0) h--;
    } else {
      lcp[0] = 0;
      h = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Bottom-up lcp-interval enumeration (Abouelhoda/Kurtz stack walk,
// ref: src/match/esa-bottomup.c). Emits every lcp-interval with
// depth >= mindepth as (depth, lb, rb) with rb inclusive.
// Returns count; *out_* are malloc'd int32 arrays (free with gt_free).
// ---------------------------------------------------------------------------
int64_t gt_enum_lcp_intervals(const int32_t *lcp, int64_t n1, int32_t mindepth,
                              int32_t **out_depth, int32_t **out_lb,
                              int32_t **out_rb) {
  std::vector<int32_t> vdepth, vlb, vrb;
  struct Itv { int32_t depth; int64_t lb; };
  std::vector<Itv> stack;
  stack.push_back({0, 0});
  for (int64_t i = 1; i <= n1; i++) {
    int32_t l = (i < n1) ? lcp[i] : 0;
    int64_t lb = i - 1;
    while (l < stack.back().depth) {
      Itv top = stack.back();
      stack.pop_back();
      // interval [top.lb, i-1] at depth top.depth
      if (top.depth >= mindepth) {
        vdepth.push_back(top.depth);
        vlb.push_back((int32_t)top.lb);
        vrb.push_back((int32_t)(i - 1));
      }
      lb = top.lb;
    }
    if (l > stack.back().depth) stack.push_back({l, lb});
  }
  int64_t cnt = (int64_t)vdepth.size();
  *out_depth = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  *out_lb = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  *out_rb = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  memcpy(*out_depth, vdepth.data(), sizeof(int32_t) * cnt);
  memcpy(*out_lb, vlb.data(), sizeof(int32_t) * cnt);
  memcpy(*out_rb, vrb.data(), sizeof(int32_t) * cnt);
  return cnt;
}

// ---------------------------------------------------------------------------
// Maximal pairs (repfind core; capability equivalent of
// gt_enumeratemaxpairs_generic, ref: src/match/esa-maxpairs.c:477).
//
// Bottom-up traversal keeping per-interval position lists classified by the
// preceding character (class = code 0..sigma-1, or `sigma` for
// position 0 / preceding special). At each lcp-interval of depth
// >= searchlength, positions arriving from a new child are cross-multiplied
// against positions of *different* classes already in the interval
// (the special class also pairs with itself: each special character is
// unique, so "same class" specials are still left-maximal).
// Right-maximality holds because pairs are only emitted at the interval
// whose depth equals their longest common prefix (children were already
// merged when the pair spans two children).
//
// sa, lcp: int32[n1]; cls: uint8[n1] class per suffix-array entry
// (cls[r] = class of sa[r]); sigma = number of regular classes.
// Outputs malloc'd arrays p1, p2 (positions, p1 from earlier child),
// len (= interval depth). Returns pair count.
// ---------------------------------------------------------------------------
// Invariant of the walk: entering boundary i (the lcp value between ranks
// i-1 and i), the stack top's depth equals lcp[i-1], so leaf i-1 either
// starts a fresh deeper interval (lcp[i] > lcp[i-1]) or attaches to the
// top. Pairs are emitted exactly at the LCA depth: leaf-vs-accumulated on
// attach, completed-child-vs-accumulated on merge. Per-class position
// lists are singly linked for O(1) concatenation (the reference uses the
// same trick, ref: esa-maxpairs.c position lists).
int64_t gt_maxpairs(const int32_t *sa, const int32_t *lcp, const uint8_t *cls,
                    int64_t n1, int32_t searchlength, uint8_t sigma,
                    int32_t **out_p1, int32_t **out_p2, int32_t **out_len) {
  const int nclasses = sigma + 1;
  std::vector<int32_t> rp1, rp2, rlen;
  std::vector<int64_t> nxt(n1, -1);  // linked-list next per SA rank

  struct Node {
    int32_t depth;
    std::vector<int64_t> head, tail;  // per class, SA-rank indices; -1 empty
    explicit Node(int32_t d, int nc)
        : depth(d), head(nc, -1), tail(nc, -1) {}
  };
  std::vector<Node> stack;
  stack.emplace_back(0, nclasses);

  auto emit_vs_node = [&](Node &node, int64_t rank, int32_t depth) {
    // pairs between leaf `rank` and all positions already in `node`
    if (depth < searchlength) return;
    int cb = cls[rank];
    for (int ca = 0; ca < nclasses; ca++) {
      if (ca == cb && ca != sigma) continue;  // left-maximality
      for (int64_t r = node.head[ca]; r != -1; r = nxt[r]) {
        rp1.push_back(sa[r]);
        rp2.push_back(sa[rank]);
        rlen.push_back(depth);
      }
    }
  };
  auto emit_child_vs_node = [&](Node &node, Node &child, int32_t depth) {
    if (depth < searchlength) return;
    for (int ca = 0; ca < nclasses; ca++) {
      for (int cb = 0; cb < nclasses; cb++) {
        if (ca == cb && ca != sigma) continue;
        for (int64_t ra = node.head[ca]; ra != -1; ra = nxt[ra])
          for (int64_t rb = child.head[cb]; rb != -1; rb = nxt[rb]) {
            rp1.push_back(sa[ra]);
            rp2.push_back(sa[rb]);
            rlen.push_back(depth);
          }
      }
    }
  };
  auto add_leaf = [&](Node &node, int64_t rank) {
    int c = cls[rank];
    if (node.head[c] == -1) {
      node.head[c] = node.tail[c] = rank;
    } else {
      nxt[node.tail[c]] = rank;
      node.tail[c] = rank;
    }
  };
  auto merge_child = [&](Node &node, Node &child) {
    for (int c = 0; c < nclasses; c++) {
      if (child.head[c] == -1) continue;
      if (node.head[c] == -1) {
        node.head[c] = child.head[c];
        node.tail[c] = child.tail[c];
      } else {
        nxt[node.tail[c]] = child.head[c];
        node.tail[c] = child.tail[c];
      }
    }
  };

  for (int64_t i = 1; i <= n1; i++) {
    int32_t l = (i < n1) ? lcp[i] : 0;
    // leaf i-1
    if (l > stack.back().depth) {
      Node fresh(l, nclasses);
      add_leaf(fresh, i - 1);
      stack.push_back(std::move(fresh));
    } else {
      emit_vs_node(stack.back(), i - 1, stack.back().depth);
      add_leaf(stack.back(), i - 1);
    }
    // close intervals deeper than l
    while (l < stack.back().depth) {
      Node child = std::move(stack.back());
      stack.pop_back();
      if (l > stack.back().depth) {
        Node fresh(l, nclasses);
        merge_child(fresh, child);  // first child, no emission
        stack.push_back(std::move(fresh));
        break;
      }
      emit_child_vs_node(stack.back(), child, stack.back().depth);
      merge_child(stack.back(), child);
    }
  }
  int64_t cnt = (int64_t)rp1.size();
  *out_p1 = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  *out_p2 = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  *out_len = (int32_t *)malloc(sizeof(int32_t) * (cnt ? cnt : 1));
  memcpy(*out_p1, rp1.data(), sizeof(int32_t) * cnt);
  memcpy(*out_p2, rp2.data(), sizeof(int32_t) * cnt);
  memcpy(*out_len, rlen.data(), sizeof(int32_t) * cnt);
  return cnt;
}

}  // extern "C"
