// Native marching tetrahedra with vertex welding.
//
// C++ twin of bundlesdf_tpu/mesh/marching.py (which replaces skimage
// marching_cubes in the reference extract_mesh, nerf_runner.py:1351-1409).
// Mesh extraction runs every NOF batch in the online loop; this keeps it
// off the Python interpreter. Same cube split (6 tets sharing the 0-7
// diagonal) and first-principles case handling.

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

// corner c = (x,y,z) with x=c&1, y=(c>>1)&1, z=(c>>2)&1 (matches marching.py)
const int CUBE_OFF[8][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
                            {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
const int TETS[6][4] = {{0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
                        {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7}};
const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

int edge_id(int a, int b) {
  if (a > b) std::swap(a, b);
  for (int e = 0; e < 6; e++)
    if (TET_EDGES[e][0] == a && TET_EDGES[e][1] == b) return e;
  return -1;
}

struct VKey {
  int64_t x, y, z;
  bool operator==(const VKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct VKeyHash {
  size_t operator()(const VKey& k) const {
    return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

}  // namespace

extern "C" {

// field: (nx,ny,nz) float32, C order. Returns counts via out params; caller
// then fetches data with marching_tet_fetch (two-phase to size buffers).
static std::vector<double> g_verts;
static std::vector<int64_t> g_faces;

void marching_tet_run(const float* field, int nx, int ny, int nz,
                      float isolevel, int64_t* n_verts_out,
                      int64_t* n_faces_out) {
  g_verts.clear();
  g_faces.clear();
  std::unordered_map<VKey, int64_t, VKeyHash> weld;
  const double WELD_SCALE = 1e6;

  auto F = [&](int x, int y, int z) -> double {
    return field[((size_t)x * ny + y) * nz + z];
  };

  auto add_vertex = [&](double px, double py, double pz) -> int64_t {
    VKey k{(int64_t)llround(px * WELD_SCALE), (int64_t)llround(py * WELD_SCALE),
           (int64_t)llround(pz * WELD_SCALE)};
    auto it = weld.find(k);
    if (it != weld.end()) return it->second;
    int64_t id = (int64_t)(g_verts.size() / 3);
    g_verts.push_back(px);
    g_verts.push_back(py);
    g_verts.push_back(pz);
    weld.emplace(k, id);
    return id;
  };

  double corner_val[8];
  double corner_pos[8][3];
  int64_t tri[3];

  for (int cx = 0; cx < nx - 1; cx++) {
    for (int cy = 0; cy < ny - 1; cy++) {
      for (int cz = 0; cz < nz - 1; cz++) {
        bool any_in = false, all_in = true;
        for (int c = 0; c < 8; c++) {
          int x = cx + CUBE_OFF[c][0], y = cy + CUBE_OFF[c][1],
              z = cz + CUBE_OFF[c][2];
          corner_val[c] = F(x, y, z);
          corner_pos[c][0] = x;
          corner_pos[c][1] = y;
          corner_pos[c][2] = z;
          bool in = corner_val[c] < isolevel;
          any_in |= in;
          all_in &= in;
        }
        if (!any_in || all_in) continue;

        for (int t = 0; t < 6; t++) {
          double tv[4];
          const double* tp[4];
          int code = 0;
          for (int i = 0; i < 4; i++) {
            tv[i] = corner_val[TETS[t][i]];
            tp[i] = corner_pos[TETS[t][i]];
            if (tv[i] < isolevel) code |= 1 << i;
          }
          if (code == 0 || code == 15) continue;

          auto interp = [&](int e, double* out) {
            int a = TET_EDGES[e][0], b = TET_EDGES[e][1];
            double va = tv[a], vb = tv[b];
            double tt = std::abs(vb - va) < 1e-12
                            ? 0.5
                            : (isolevel - va) / (vb - va);
            tt = std::min(std::max(tt, 0.0), 1.0);
            for (int d = 0; d < 3; d++)
              out[d] = tp[a][d] + tt * (tp[b][d] - tp[a][d]);
          };

          int inside[4], outside[4], ni = 0, no = 0;
          for (int i = 0; i < 4; i++) {
            if (code >> i & 1)
              inside[ni++] = i;
            else
              outside[no++] = i;
          }

          double p[4][3];
          if (ni == 1 || ni == 3) {
            int one = (ni == 1) ? inside[0] : outside[0];
            int* rest = (ni == 1) ? outside : inside;
            for (int i = 0; i < 3; i++) interp(edge_id(one, rest[i]), p[i]);
            for (int i = 0; i < 3; i++)
              tri[i] = add_vertex(p[i][0], p[i][1], p[i][2]);
            if (tri[0] != tri[1] && tri[1] != tri[2] && tri[0] != tri[2]) {
              g_faces.insert(g_faces.end(), {tri[0], tri[1], tri[2]});
            }
          } else {  // ni == 2: quad (a,c),(a,d),(b,d),(b,c)
            int a = inside[0], b = inside[1], c = outside[0], d = outside[1];
            interp(edge_id(a, c), p[0]);
            interp(edge_id(a, d), p[1]);
            interp(edge_id(b, d), p[2]);
            interp(edge_id(b, c), p[3]);
            int64_t q[4];
            for (int i = 0; i < 4; i++)
              q[i] = add_vertex(p[i][0], p[i][1], p[i][2]);
            if (q[0] != q[1] && q[1] != q[2] && q[0] != q[2])
              g_faces.insert(g_faces.end(), {q[0], q[1], q[2]});
            if (q[0] != q[2] && q[2] != q[3] && q[0] != q[3])
              g_faces.insert(g_faces.end(), {q[0], q[2], q[3]});
          }
        }
      }
    }
  }

  *n_verts_out = (int64_t)(g_verts.size() / 3);
  *n_faces_out = (int64_t)(g_faces.size() / 3);
}

void marching_tet_fetch(double* verts_out, int64_t* faces_out) {
  std::copy(g_verts.begin(), g_verts.end(), verts_out);
  std::copy(g_faces.begin(), g_faces.end(), faces_out);
  g_verts.clear();
  g_faces.clear();
}

}  // extern "C"
