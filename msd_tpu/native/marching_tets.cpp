// Native marching-tetrahedra backend.
//
// C-ABI library called from msd_tpu/ops/marching_cubes.py via ctypes —
// replaces the vectorized-numpy hot path (edge hashing + top-level sort
// dominate there). Single pass over active blocks with an open-addressing
// edge->vertex hash map; ~10x the numpy path.
//
// Semantics identical to the Python implementation (same 6-tet cube
// decomposition, same case emission order, same orientation flip table —
// see msd_tpu/ops/marching_cubes.py) and validated against it in
// tests/test_native_mt.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// Cube corner offsets, index = 4x + 2y + z (matches _CORNERS)
const int CORNERS[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

// 6-tet decomposition around the 0-7 diagonal (matches _TETS)
const int TETS[6][4] = {
    {0, 4, 5, 7}, {0, 5, 1, 7}, {0, 1, 3, 7},
    {0, 3, 2, 7}, {0, 2, 6, 7}, {0, 6, 4, 7},
};

struct EdgeMap {
  // open addressing, power-of-two capacity
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  size_t mask;
  size_t count = 0;

  explicit EdgeMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, UINT64_MAX);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  void grow() {
    EdgeMap bigger(keys.size());
    for (size_t i = 0; i < keys.size(); i++) {
      if (keys[i] != UINT64_MAX) bigger.insert_raw(keys[i], vals[i]);
    }
    keys.swap(bigger.keys);
    vals.swap(bigger.vals);
    mask = bigger.mask;
  }

  void insert_raw(uint64_t k, int32_t v) {
    size_t h = (k * 0x9E3779B97F4A7C15ULL) & mask;
    while (keys[h] != UINT64_MAX) h = (h + 1) & mask;
    keys[h] = k;
    vals[h] = v;
    count++;
  }

  // returns existing id or -1-new_id if inserted
  int32_t get_or_insert(uint64_t k, int32_t next_id) {
    if (count * 2 >= keys.size()) grow();
    size_t h = (k * 0x9E3779B97F4A7C15ULL) & mask;
    while (true) {
      if (keys[h] == UINT64_MAX) {
        keys[h] = k;
        vals[h] = next_id;
        count++;
        return -1 - next_id;
      }
      if (keys[h] == k) return vals[h];
      h = (h + 1) & mask;
    }
  }
};

struct Builder {
  std::vector<float> verts;     // xyz triples (grid-index space)
  std::vector<int32_t> faces;   // triangles
  EdgeMap edges;                // global map: block-BOUNDARY edges only
  int64_t N;
  const uint8_t* flips;
  int64_t deltas[13];           // possible hi-lo values for cell-corner edges
  int n_deltas = 0;
  // per-corner-pair edge code table (code of |id(a)-id(b)| for cube corners)
  int code_tab[8][8];
  // global-id offset of each cube corner relative to corner 0 (fixed per N)
  int64_t corner_delta[8];
  // current block's fine-grid base (set per block): new-vertex positions
  // are base + local lattice coords — no div/mod chain on the global id
  int64_t base[3] = {0, 0, 0};

  // Block-local edge cache (stamp-versioned so no per-block clearing):
  // local edges are deduped in this L1/L2-resident array; the global hash
  // map is consulted only for edges lying on a block face (shared with a
  // neighboring block). Sized at first add_blocks call for the block size.
  std::vector<int32_t> local_ids;
  std::vector<int32_t> local_stamp;
  int32_t stamp = 0;
  int local_bp = 0;

  // Incremental PLY spill: vertex/face data written to temp files as blocks
  // are meshed (on the caller's worker thread, overlapped with device
  // transfers), so the final .ply write is just header + two file copies.
  FILE* spill_fv = nullptr;
  FILE* spill_ff = nullptr;
  size_t spilled_v = 0;  // floats already spilled from verts
  size_t spilled_f = 0;  // int32s already spilled from faces
  float spill_scale = 1.0f;
  float spill_off = 0.0f;
  bool spill_error = false;  // a spill fwrite came up short (e.g. tmpfs full)
  ~Builder() {
    if (spill_fv) fclose(spill_fv);
    if (spill_ff) fclose(spill_ff);
  }

  Builder(size_t expected_edges, int64_t n, const uint8_t* flip)
      : edges(expected_edges), N(n), flips(flip) {
    // enumerate positive deltas dx*N^2 + dy*N + dz, d* in {-1,0,1}
    for (int dx = -1; dx <= 1; dx++)
      for (int dy = -1; dy <= 1; dy++)
        for (int dz = -1; dz <= 1; dz++) {
          int64_t d = (int64_t)dx * N * N + (int64_t)dy * N + dz;
          if (d > 0 && n_deltas < 13) deltas[n_deltas++] = d;  // exactly 13
        }
    for (int a = 0; a < 8; a++)
      for (int b = 0; b < 8; b++) {
        int64_t d = ((int64_t)(CORNERS[a][0] - CORNERS[b][0]) * N +
                     (CORNERS[a][1] - CORNERS[b][1])) * N +
                    (CORNERS[a][2] - CORNERS[b][2]);
        code_tab[a][b] = delta_code(d < 0 ? -d : d);
      }
    for (int c = 0; c < 8; c++)
      corner_delta[c] =
          ((int64_t)CORNERS[c][0] * N + CORNERS[c][1]) * N + CORNERS[c][2];
  }

  inline int delta_code(int64_t d) {
    for (int i = 0; i < n_deltas; i++)
      if (deltas[i] == d) return i;
    return 13;  // unreachable for valid cell edges
  }


  void begin_block(int bp) {
    if (local_bp != bp) {
      local_bp = bp;
      local_ids.assign((size_t)bp * bp * bp * 14, -1);
      local_stamp.assign((size_t)bp * bp * bp * 14, -1);
      stamp = 0;
    }
    stamp++;
  }

  // vertex on edge between global ids a/b at local lattice coords
  // la/lb (each in [0, bp)); code = precomputed |delta| code; sa/sb sdf.
  inline int32_t edge_vertex(int64_t a, int64_t b, int code,
                             const int* la, const int* lb,
                             double sa, double sb) {
    const bool a_lo = a < b;
    const int64_t lo = a_lo ? a : b;
    const int* ll = a_lo ? la : lb;
    const int bp = local_bp;
    const size_t lkey =
        (((size_t)ll[0] * bp + ll[1]) * bp + ll[2]) * 14 + code;
    if (local_stamp[lkey] == stamp) return local_ids[lkey];

    // shared across blocks iff the edge lies in a block-face plane
    const int* lh = a_lo ? lb : la;
    const int last = bp - 1;
    bool boundary = false;
    for (int ax = 0; ax < 3; ax++) {
      if (ll[ax] == lh[ax] && (ll[ax] == 0 || ll[ax] == last)) {
        boundary = true;
        break;
      }
    }

    int32_t next_id = (int32_t)(verts.size() / 3);
    if (boundary) {
      uint64_t key = (uint64_t)lo * 14 + (uint64_t)code;
      int32_t got = edges.get_or_insert(key, next_id);
      if (got >= 0) {
        local_ids[lkey] = got;
        local_stamp[lkey] = stamp;
        return got;
      }
    }
    local_ids[lkey] = next_id;
    local_stamp[lkey] = stamp;
    // new vertex: interpolate between endpoint positions
    double denom = sb - sa;
    if (std::fabs(denom) < 1e-12) denom = 1e-12;
    double t = (0.0 - sa) / denom;
    if (t < 0) t = 0;
    if (t > 1) t = 1;
    // endpoint positions are base + local lattice coords (identical to the
    // div/mod decomposition of the global ids, without the 6 int64
    // divisions by runtime N per new vertex)
    for (int ax = 0; ax < 3; ax++) {
      const double p0 = (double)(base[ax] + la[ax]);
      const double p1 = (double)(base[ax] + lb[ax]);
      verts.push_back((float)(p0 + t * (p1 - p0)));
    }
    return next_id;
  }

  inline void emit_tri(int32_t v0, int32_t v1, int32_t v2, bool flip) {
    if (v0 == v1 || v1 == v2 || v0 == v2) return;
    if (flip) {
      faces.push_back(v0);
      faces.push_back(v2);
      faces.push_back(v1);
    } else {
      faces.push_back(v0);
      faces.push_back(v1);
      faces.push_back(v2);
    }
  }

  // cube-corner-index based edge lookup: ca/cb in [0,8), arrays are the
  // cell's 8 corner global ids / sdf values / local lattice coords
  inline int32_t cedge(int ca, int cb, const int64_t* ids, const double* sdf,
                       const int (*lc)[3]) {
    return edge_vertex(ids[ca], ids[cb], code_tab[ca][cb], lc[ca], lc[cb],
                       sdf[ca], sdf[cb]);
  }

  // ``m``: the cell's 8-corner inside bitmask (bit c = sdf[c] < 0), already
  // computed by the caller's precount pass — avoids 24 double sign tests
  // per cell.
  void process_tet(int t, const int* cs, const int64_t* ids,
                   const double* sdf, const int (*lc)[3], unsigned m) {
    bool in[4];
    int subset = 0, n_in = 0;
    for (int v = 0; v < 4; v++) {
      in[v] = (m >> cs[v]) & 1u;
      if (in[v]) {
        subset |= 1 << v;
        n_in++;
      }
    }
    if (n_in == 0 || n_in == 4) return;
    const uint8_t* F = flips + ((size_t)t * 16 + subset) * 2;

    if (n_in == 1) {
      int v = 0;
      while (!in[v]) v++;
      int o[3], k = 0;
      for (int i = 0; i < 4; i++)
        if (i != v) o[k++] = i;
      int32_t e0 = cedge(cs[v], cs[o[0]], ids, sdf, lc);
      int32_t e1 = cedge(cs[v], cs[o[1]], ids, sdf, lc);
      int32_t e2 = cedge(cs[v], cs[o[2]], ids, sdf, lc);
      emit_tri(e0, e1, e2, F[0]);
    } else if (n_in == 3) {
      int v = 0;
      while (in[v]) v++;
      int o[3], k = 0;
      for (int i = 0; i < 4; i++)
        if (i != v) o[k++] = i;
      int32_t e0 = cedge(cs[o[0]], cs[v], ids, sdf, lc);
      int32_t e1 = cedge(cs[o[1]], cs[v], ids, sdf, lc);
      int32_t e2 = cedge(cs[o[2]], cs[v], ids, sdf, lc);
      emit_tri(e0, e1, e2, F[0]);
    } else {
      // 2-2: quad in cyclic order (v0,o0), (v0,o1), (v1,o1), (v1,o0)
      int vi[2], oi[2], a = 0, b = 0;
      for (int i = 0; i < 4; i++) {
        if (in[i]) vi[a++] = i;
        else oi[b++] = i;
      }
      int32_t q0 = cedge(cs[vi[0]], cs[oi[0]], ids, sdf, lc);
      int32_t q1 = cedge(cs[vi[0]], cs[oi[1]], ids, sdf, lc);
      int32_t q2 = cedge(cs[vi[1]], cs[oi[1]], ids, sdf, lc);
      int32_t q3 = cedge(cs[vi[1]], cs[oi[0]], ids, sdf, lc);
      emit_tri(q0, q1, q2, F[0]);
      emit_tri(q0, q2, q3, F[1]);
    }
  }
};

}  // namespace

static void add_blocks_impl(
    Builder& builder,
    const float* block_vals,
    const int32_t* bases,
    int64_t num_blocks,
    int32_t b,
    int64_t N) {
  const int bp = b + 1;
  const int64_t pts_per = (int64_t)bp * bp * bp;
  // per-block corner-sign bits: most cells even of a CROSSING block are
  // uncut (~79% on a 512^3 sphere shell), so reject them from 8 byte
  // loads instead of 8 float gathers plus int64 id math (measured ~1.4x
  // on the mesher hot loop)
  std::vector<uint8_t> inb((size_t)pts_per);
  const size_t rbp = (size_t)bp;
  for (int64_t blk = 0; blk < num_blocks; blk++) {
    const float* vals = block_vals + blk * pts_per;
    const int64_t bx = bases[blk * 3 + 0];
    const int64_t by = bases[blk * 3 + 1];
    const int64_t bz = bases[blk * 3 + 2];
    int64_t total_in = 0;
    for (int64_t i = 0; i < pts_per; i++) {
      inb[(size_t)i] = vals[i] < 0.0f;
      total_in += inb[(size_t)i];
    }
    if (total_in == 0 || total_in == pts_per) continue;
    builder.begin_block(bp);
    builder.base[0] = bx;
    builder.base[1] = by;
    builder.base[2] = bz;
    for (int ci = 0; ci < b; ci++) {
      for (int cj = 0; cj < b; cj++) {
        const uint8_t* row = &inb[((size_t)ci * rbp + cj) * rbp];
        for (int ck = 0; ck < b; ck++) {
          const uint8_t* r = row + ck;
          // inside bitmask over the cell's 8 corners, bit index 4x+2y+z
          // (the corner order of CORNERS/_CORNERS)
          const unsigned m =
              (unsigned)r[0] | ((unsigned)r[1] << 1) |
              ((unsigned)r[rbp] << 2) | ((unsigned)r[rbp + 1] << 3) |
              ((unsigned)r[rbp * rbp] << 4) | ((unsigned)r[rbp * rbp + 1] << 5) |
              ((unsigned)r[rbp * rbp + rbp] << 6) |
              ((unsigned)r[rbp * rbp + rbp + 1] << 7);
          if (m == 0u || m == 255u) continue;
          // gather 8 corners of this cut cell; global ids are corner-0's id
          // plus a per-corner delta fixed at construction (saves two int64
          // muls per corner)
          const int64_t id0 = ((bx + ci) * N + (by + cj)) * N + (bz + ck);
          double s[8];
          int64_t ids[8];
          int lc[8][3];
          for (int c = 0; c < 8; c++) {
            const int x = ci + CORNERS[c][0];
            const int y = cj + CORNERS[c][1];
            const int z = ck + CORNERS[c][2];
            s[c] = (double)vals[((int64_t)x * bp + y) * bp + z];
            ids[c] = id0 + builder.corner_delta[c];
            lc[c][0] = x;
            lc[c][1] = y;
            lc[c][2] = z;
          }
          for (int t = 0; t < 6; t++) {
            builder.process_tet(t, TETS[t], ids, s, lc, m);
          }
        }
      }
    }
  }
}

extern "C" {

// ---- streaming builder API (overlap host meshing with device eval) ----

void* mt_create(int64_t N, const uint8_t* flips, int64_t expected_blocks) {
  // flips must outlive the handle (the Python side keeps it alive)
  return new Builder((size_t)expected_blocks * 16 + 1024, N, flips);
}

static void spill_new_geometry(Builder& b) {
  if (b.spill_error) return;
  if (b.spill_fv) {
    size_t n = b.verts.size();
    if (n > b.spilled_v) {
      float buf[3072];
      size_t i = b.spilled_v;
      while (i < n) {
        size_t c = n - i < 3072 ? n - i : 3072;
        for (size_t j = 0; j < c; j++) buf[j] = b.verts[i + j] * b.spill_scale + b.spill_off;
        if (fwrite(buf, sizeof(float), c, b.spill_fv) != c) { b.spill_error = true; return; }
        i += c;
      }
      b.spilled_v = n;
    }
  }
  if (b.spill_ff) {
    size_t n = b.faces.size();
    if (n > b.spilled_f) {
      // PLY face row: uchar 3 + 3x int32 = 13 bytes
      unsigned char buf[13 * 256];
      size_t i = b.spilled_f;
      while (i < n) {
        size_t c = (n - i) / 3 < 256 ? (n - i) / 3 : 256;
        for (size_t j = 0; j < c; j++) {
          unsigned char* p = buf + 13 * j;
          p[0] = 3;
          memcpy(p + 1, &b.faces[i + 3 * j], 12);
        }
        if (fwrite(buf, 13, c, b.spill_ff) != c) { b.spill_error = true; return; }
        i += 3 * c;
      }
      b.spilled_f = i;
    }
  }
}

void mt_add_blocks(
    void* handle, const float* block_vals, const int32_t* bases,
    int64_t num_blocks, int32_t b) {
  Builder* builder = (Builder*)handle;
  add_blocks_impl(*builder, block_vals, bases, num_blocks, b, builder->N);
  spill_new_geometry(*builder);
}

// Begin streaming PLY output: vertex/face payloads spill to the two temp
// paths during mt_add_blocks; mt_ply_stream_finish assembles the final file.
int mt_ply_stream_begin(
    void* handle, const char* vert_path, const char* face_path,
    float scale, float offset) {
  Builder* builder = (Builder*)handle;
  builder->spill_fv = fopen(vert_path, "w+b");
  builder->spill_ff = fopen(face_path, "w+b");
  if (!builder->spill_fv || !builder->spill_ff) return -1;
  setvbuf(builder->spill_fv, nullptr, _IOFBF, 1 << 20);
  setvbuf(builder->spill_ff, nullptr, _IOFBF, 1 << 20);
  builder->spill_scale = scale;
  builder->spill_off = offset;
  return 0;
}

// Write header + concatenate the spilled payloads into final_path.
// Does NOT destroy the builder (callers still read the in-memory mesh).
int mt_ply_stream_finish(void* handle, const char* final_path) {
  Builder* builder = (Builder*)handle;
  if (!builder->spill_fv || !builder->spill_ff) return -1;
  spill_new_geometry(*builder);
  if (builder->spill_error) return -1;
  FILE* out = fopen(final_path, "wb");
  if (!out) return -1;
  setvbuf(out, nullptr, _IOFBF, 1 << 20);
  char header[256];
  int hn = snprintf(
      header, sizeof(header),
      "ply\nformat binary_little_endian 1.0\n"
      "element vertex %lld\nproperty float x\nproperty float y\nproperty float z\n"
      "element face %lld\nproperty list uchar int vertex_indices\nend_header\n",
      (long long)(builder->verts.size() / 3), (long long)(builder->faces.size() / 3));
  int rc0 = fwrite(header, 1, (size_t)hn, out) == (size_t)hn ? 0 : -1;
  static thread_local std::vector<char> buf(1 << 20);
  FILE* parts[2] = {builder->spill_fv, builder->spill_ff};
  int rc = rc0;
  for (int p = 0; p < 2; p++) {
    fflush(parts[p]);
    rewind(parts[p]);
    size_t n;
    while ((n = fread(buf.data(), 1, buf.size(), parts[p])) > 0) {
      if (fwrite(buf.data(), 1, n, out) != n) { rc = -1; break; }
    }
    fclose(parts[p]);
  }
  builder->spill_fv = nullptr;
  builder->spill_ff = nullptr;
  if (fclose(out) != 0) rc = -1;
  return rc;
}

// Zero-copy variant: returns views of the builder's internal buffers.
// The pointers stay valid until mt_destroy(handle); the caller must copy
// (or transform) them out before destroying and must NOT mt_free() them.
int mt_finish_view(
    void* handle,
    float** out_verts, int64_t* out_num_verts,
    int32_t** out_faces, int64_t* out_num_faces) {
  Builder* builder = (Builder*)handle;
  *out_num_verts = (int64_t)(builder->verts.size() / 3);
  *out_num_faces = (int64_t)(builder->faces.size() / 3);
  *out_verts = builder->verts.data();
  *out_faces = builder->faces.data();
  return 0;
}

void mt_destroy(void* handle) { delete (Builder*)handle; }

int mt_finish(
    void* handle,
    float** out_verts, int64_t* out_num_verts,
    int32_t** out_faces, int64_t* out_num_faces) {
  Builder* builder = (Builder*)handle;
  *out_num_verts = (int64_t)(builder->verts.size() / 3);
  *out_num_faces = (int64_t)(builder->faces.size() / 3);
  *out_verts = (float*)malloc(builder->verts.size() * sizeof(float));
  *out_faces = (int32_t*)malloc(builder->faces.size() * sizeof(int32_t));
  int rc = 0;
  if ((!*out_verts && !builder->verts.empty()) || (!*out_faces && !builder->faces.empty()))
    rc = -1;
  else {
    memcpy(*out_verts, builder->verts.data(), builder->verts.size() * sizeof(float));
    memcpy(*out_faces, builder->faces.data(), builder->faces.size() * sizeof(int32_t));
  }
  delete builder;
  return rc;
}

// ---- one-shot API ----

int mt_blocks(
    const float* block_vals,
    const int32_t* bases,
    int64_t num_blocks,
    int32_t b,
    int64_t N,
    const uint8_t* flips,
    float** out_verts,
    int64_t* out_num_verts,
    int32_t** out_faces,
    int64_t* out_num_faces) {
  Builder builder((size_t)num_blocks * 16 + 1024, N, flips);
  add_blocks_impl(builder, block_vals, bases, num_blocks, b, N);
  *out_num_verts = (int64_t)(builder.verts.size() / 3);
  *out_num_faces = (int64_t)(builder.faces.size() / 3);
  *out_verts = (float*)malloc(builder.verts.size() * sizeof(float));
  *out_faces = (int32_t*)malloc(builder.faces.size() * sizeof(int32_t));
  if ((!*out_verts && !builder.verts.empty()) || (!*out_faces && !builder.faces.empty()))
    return -1;
  memcpy(*out_verts, builder.verts.data(), builder.verts.size() * sizeof(float));
  memcpy(*out_faces, builder.faces.data(), builder.faces.size() * sizeof(int32_t));
  return 0;
}

void mt_free(void* p) { free(p); }

}  // extern "C"
