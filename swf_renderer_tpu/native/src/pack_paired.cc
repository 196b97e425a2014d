// Paired-supergroup packer: schedules TWO ADJACENT (frame, strip)
// supergroups per fused-kernel grid step (lanes A = strip 2p and
// B = strip 2p+1, each with its own accumulator), so the per-step pipeline
// overhead is paid once per ~2 strips instead of once per strip.  Because
// the pair is adjacent, both lanes resolve into ONE kernel output block
// (1, 1, 2, spp*8, stride) — no host-side merge of two output arrays.
//
// A pair's blocks are laid out as lane A's blocks followed by lane B's
// across ceil((nA+nB)/group) steps, so within every step the A slots are a
// prefix and the B slots follow — the kernel routes slot g to lane A when
// g < usedA and to lane B when usedA <= g < usedA + usedB.
//
// Flags per lane: bit0 = zero the lane's accumulator (lane's first step),
// bit1 = resolve + emit the lane's strip (lane's last step), bits 2+ = the
// lane's used slot count this step.  Empty strips zero + resolve with no
// placement slots.
//
// gsi packs (frame * layers) * (n_pairs + 1) + pair — the kernel extracts
// frame and pair index from it.  Same update -> (rc, cm, val) encoding as
// pack_grouped.cc.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int kStripH = 8;
constexpr int kLane = 128;
}  // namespace

extern "C" {

// Upper bound on steps for one frame.
int64_t swf_pack_paired_capacity(int64_t n_updates, int32_t layers,
                                 int32_t n_strips, int32_t group,
                                 int32_t blk) {
  int64_t blocks = n_updates / blk
      + static_cast<int64_t>(n_strips) * (layers + 1) + 1;
  return blocks / group + (n_strips + 1) / 2 + 2;
}

int64_t swf_pack_paired(const int32_t* rows, const int32_t* cols,
                        const float* vals, const int64_t* offsets,
                        int32_t layers, int32_t n_strips,
                        int32_t frame_base, int32_t group, int32_t blk,
                        int32_t spp, int32_t n_chunks, int64_t capacity,
                        int32_t* gsi, int32_t* gfa, int32_t* gfb,
                        int32_t* glay, float* grc, float* gcm,
                        float* gvv) {
  const int32_t ns1 = n_strips + 1;
  const int32_t n_pairs = (n_strips + 1) / 2;
  const int32_t np1 = n_pairs + 1;
  const int64_t gb = static_cast<int64_t>(group) * blk;
  const int32_t block_rows = kStripH * spp;
  const int32_t nc8 = n_chunks * kStripH;

  // Per-layer strip start indices (updates are row-major sorted).
  std::vector<int64_t> sstart(static_cast<size_t>(layers) * ns1);
  for (int32_t l = 0; l < layers; ++l) {
    int64_t i = offsets[l];
    const int64_t hi = offsets[l + 1];
    for (int32_t s = 0; s <= n_strips; ++s) {
      while (i < hi && rows[i] / block_rows < s) ++i;
      sstart[static_cast<size_t>(l) * ns1 + s] = i;
    }
  }

  auto strip_blocks = [&](int32_t s) -> int64_t {
    if (s >= n_strips) return 0;
    int64_t total = 0;
    for (int32_t l = 0; l < layers; ++l) {
      int64_t cnt = sstart[static_cast<size_t>(l) * ns1 + s + 1]
          - sstart[static_cast<size_t>(l) * ns1 + s];
      total += (cnt + blk - 1) / blk;
    }
    return total;
  };

  // Writes one supergroup's blocks into the pair's slot stream starting at
  // position `pos0` (slots are (step, slot) = divmod(pos, group) relative
  // to step base `ng`).
  auto emit_blocks = [&](int32_t s, int64_t ng, int64_t pos0) {
    int64_t pos = pos0;
    for (int32_t l = 0; l < layers; ++l) {
      const int64_t lo = sstart[static_cast<size_t>(l) * ns1 + s];
      const int64_t hi = sstart[static_cast<size_t>(l) * ns1 + s + 1];
      for (int64_t b = lo; b < hi; b += blk, ++pos) {
        const int64_t g = ng + pos / group;
        const int64_t k = pos % group;
        glay[g * group + k] = l;
        float* rc = grc + g * gb + k * blk;
        float* cm = gcm + g * gb + k * blk;
        float* vv = gvv + g * gb + k * blk;
        const int64_t take = std::min<int64_t>(blk, hi - b);
        for (int64_t u = 0; u < take; ++u) {
          const int32_t r = rows[b + u];
          const int32_t c = cols[b + u];
          rc[u] = static_cast<float>(
              ((r / kStripH) % spp) * nc8 + (c / kLane) * kStripH
              + r % kStripH);
          cm[u] = static_cast<float>(c % kLane);
          vv[u] = vals[b + u];
        }
      }
    }
  };

  int64_t ng = 0;
  for (int32_t p = 0; p < n_pairs; ++p) {
    const int32_t sa = 2 * p;
    const int32_t sb = 2 * p + 1;  // may be == n_strips (absent)
    const bool has_b = sb < n_strips;
    const int64_t na = strip_blocks(sa);
    const int64_t nb = strip_blocks(sb);
    const int64_t total = std::max<int64_t>(na + nb, 1);
    const int64_t steps = (total + group - 1) / group;
    if (ng + steps > capacity) return -1;

    std::memset(grc + ng * gb, 0, steps * gb * sizeof(float));
    std::memset(gcm + ng * gb, 0, steps * gb * sizeof(float));
    std::memset(gvv + ng * gb, 0, steps * gb * sizeof(float));
    std::memset(glay + ng * group, 0, steps * group * sizeof(int32_t));

    const int64_t last_a = na > 0 ? (na - 1) / group : 0;
    // An empty-but-present B zeroes + resolves on the pair's final step.
    const int64_t first_b = nb > 0 ? na / group : steps - 1;
    const int64_t last_b = nb > 0 ? (na + nb - 1) / group : steps - 1;
    for (int64_t g = 0; g < steps; ++g) {
      const int64_t a0 = g * group, a1 = a0 + group;  // position window
      const int64_t used_a =
          std::max<int64_t>(0, std::min(na, a1) - std::min(na, a0));
      const int64_t used_b = !has_b ? 0 :
          std::max<int64_t>(0,
              std::min(na + nb, a1) - std::max(na, std::min(na + nb, a0)));
      gsi[ng + g] = frame_base * np1 + p;
      gfa[ng + g] = (g == 0 ? 1 : 0) | (g == last_a ? 2 : 0)
          | static_cast<int32_t>(used_a << 2);
      gfb[ng + g] = !has_b ? 0
          : ((g == first_b ? 1 : 0) | (g == last_b ? 2 : 0)
             | static_cast<int32_t>(used_b << 2));
    }
    emit_blocks(sa, ng, 0);
    if (has_b) emit_blocks(sb, ng, na);
    ng += steps;
  }
  return ng;
}

}  // extern "C"
