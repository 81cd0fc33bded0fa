// Waymo-protocol 3D detection metrics (mAP / mAPH), native C++.
//
// From-scratch replacement for the waymo-open-dataset
// compute_detection_metrics_main binary that the reference shells out to
// (reference: mmdet3d/datasets/waymo_tracklet_dataset.py:350-364). Same CLI:
//
//   compute_detection_metrics_main <predictions.bin> <ground_truth.bin>
//
// Both files are wire-format waymo.open_dataset.Objects protos (the subset
// documented in objectcentricocccompletion_tpu/evalx/waymo_bin.py; GT
// additionally carries num_lidar_points_in_box (Label field 7) and
// detection_difficulty_level (field 5)).
//
// Metric semantics (Waymo open dataset detection protocol):
//   * per class, 3D IoU matching (rotated BEV polygon intersection x height
//     overlap), IoU >= 0.7 vehicles / 0.5 pedestrians & cyclists,
//   * difficulty: LEVEL_2 = labeled level 2 OR < 5 lidar points; LEVEL_1 =
//     the rest; GT with 0 points is ignored. The LEVEL_2 metric evaluates
//     L1+L2 ground truth; the LEVEL_1 metric treats L2-only GT as "ignore"
//     (matching predictions are discarded, not counted as FP),
//   * HUNGARIAN one-to-one matching per frame (official MatcherProto
//     TYPE_HUNGARIAN: maximize total IoU over pairs with IoU >= threshold),
//     re-run at each score cutoff like the official tool,
//   * P/R curve from ~100 score cutoffs sampled as quantiles of the
//     class's prediction-score distribution (DecideScoreCutoffs analog),
//   * AP integrates precision over recall with the documented recall-gap
//     penalty: any gap between consecutive recall points beyond
//     delta = 0.05 contributes zero precision; APH weights each true
//     positive by heading accuracy 1 - |wrap(dh)| / pi,
//   * breakdowns: OBJECT_TYPE and RANGE ([0,30), [30,50), [50,inf) by
//     BEV center distance), printed in the official output format parsed by
//     the reference's evaluate() (waymo_tracklet_dataset.py:394-401).
//
// Known residual divergences from the official binary (documented, not
// bit-identical): exact score-cutoff placement, and tie-breaking inside
// the assignment when multiple matchings share the same total IoU.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <thread>
#include <atomic>
#include <vector>

namespace {

struct Box {
  double cx = 0, cy = 0, cz = 0, w = 0, l = 0, h = 0, heading = 0;
};

struct Object {
  Box box;
  float score = 0;
  int type = 0;
  std::string id;
  std::string context;
  int64_t ts = 0;
  int num_points = -1;
  int difficulty = 0;  // detection_difficulty_level
};

// ------------------------------------------------------------ proto parsing
struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
};

uint64_t ReadVarint(Cursor* c) {
  uint64_t v = 0;
  int shift = 0;
  while (c->p < c->end) {
    uint8_t b = *c->p++;
    v |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  return v;
}

double ReadDouble(Cursor* c) {
  double v;
  std::memcpy(&v, c->p, 8);
  c->p += 8;
  return v;
}

float ReadFloat(Cursor* c) {
  float v;
  std::memcpy(&v, c->p, 4);
  c->p += 4;
  return v;
}

void SkipField(Cursor* c, int wire) {
  switch (wire) {
    case 0: ReadVarint(c); break;
    case 1: c->p += 8; break;
    case 5: c->p += 4; break;
    case 2: {
      uint64_t n = ReadVarint(c);
      c->p += n;
      break;
    }
    default: c->p = c->end;
  }
}

Box ParseBox(Cursor c) {
  Box b;
  while (c.p < c.end) {
    uint64_t key = ReadVarint(&c);
    int field = key >> 3, wire = key & 7;
    if (wire == 1) {
      double v = ReadDouble(&c);
      switch (field) {
        case 1: b.cx = v; break;
        case 2: b.cy = v; break;
        case 3: b.cz = v; break;
        case 4: b.w = v; break;
        case 5: b.l = v; break;
        case 6: b.h = v; break;
        case 7: b.heading = v; break;
      }
    } else {
      SkipField(&c, wire);
    }
  }
  return b;
}

void ParseLabel(Cursor c, Object* o) {
  while (c.p < c.end) {
    uint64_t key = ReadVarint(&c);
    int field = key >> 3, wire = key & 7;
    if (field == 1 && wire == 2) {
      uint64_t n = ReadVarint(&c);
      o->box = ParseBox({c.p, c.p + n});
      c.p += n;
    } else if (field == 3 && wire == 0) {
      o->type = int(ReadVarint(&c));
    } else if (field == 4 && wire == 2) {
      uint64_t n = ReadVarint(&c);
      o->id.assign(reinterpret_cast<const char*>(c.p), n);
      c.p += n;
    } else if (field == 5 && wire == 0) {
      o->difficulty = int(ReadVarint(&c));
    } else if (field == 7 && wire == 0) {
      o->num_points = int(ReadVarint(&c));
    } else {
      SkipField(&c, wire);
    }
  }
}

void ParseObject(Cursor c, std::vector<Object>* out) {
  Object o;
  while (c.p < c.end) {
    uint64_t key = ReadVarint(&c);
    int field = key >> 3, wire = key & 7;
    if (field == 1 && wire == 2) {
      uint64_t n = ReadVarint(&c);
      ParseLabel({c.p, c.p + n}, &o);
      c.p += n;
    } else if (field == 2 && wire == 5) {
      o.score = ReadFloat(&c);
    } else if (field == 4 && wire == 2) {
      uint64_t n = ReadVarint(&c);
      o.context.assign(reinterpret_cast<const char*>(c.p), n);
      c.p += n;
    } else if (field == 5 && wire == 0) {
      o.ts = int64_t(ReadVarint(&c));
    } else {
      SkipField(&c, wire);
    }
  }
  out->push_back(std::move(o));
}

std::vector<Object> LoadObjects(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  std::string data((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  std::vector<Object> out;
  Cursor c{reinterpret_cast<const uint8_t*>(data.data()),
           reinterpret_cast<const uint8_t*>(data.data()) + data.size()};
  while (c.p < c.end) {
    uint64_t key = ReadVarint(&c);
    int field = key >> 3, wire = key & 7;
    if (field == 1 && wire == 2) {
      uint64_t n = ReadVarint(&c);
      ParseObject({c.p, c.p + n}, &out);
      c.p += n;
    } else {
      SkipField(&c, wire);
    }
  }
  return out;
}

// ------------------------------------------------------------------- IoU
struct Pt {
  double x, y;
};

// Sutherland–Hodgman convex clip; boxes as CCW 4-gons.
double PolyClipArea(const Pt* subj, const Pt* clip) {
  Pt poly[16];
  int n = 4;
  for (int i = 0; i < 4; ++i) poly[i] = subj[i];
  Pt tmp[16];
  for (int e = 0; e < 4 && n > 0; ++e) {
    Pt a = clip[e], b = clip[(e + 1) % 4];
    double abx = b.x - a.x, aby = b.y - a.y;
    int m = 0;
    for (int i = 0; i < n; ++i) {
      Pt cur = poly[i], nxt = poly[(i + 1) % n];
      double sc = abx * (cur.y - a.y) - aby * (cur.x - a.x);
      double sn = abx * (nxt.y - a.y) - aby * (nxt.x - a.x);
      if (sc >= 0) tmp[m++] = cur;
      if ((sc >= 0) != (sn >= 0)) {
        double t = sc / (sc - sn);
        tmp[m++] = {cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
      }
    }
    n = m;
    for (int i = 0; i < n; ++i) poly[i] = tmp[i];
  }
  if (n < 3) return 0.0;
  double area = 0;
  for (int i = 0; i < n; ++i) {
    int j = (i + 1) % n;
    area += poly[i].x * poly[j].y - poly[j].x * poly[i].y;
  }
  return std::fabs(area) * 0.5;
}

void Corners(const Box& b, Pt* out) {
  // waymo heading: rotation of the length axis around +z from +x
  double c = std::cos(b.heading), s = std::sin(b.heading);
  double dx[4] = {+b.l / 2, -b.l / 2, -b.l / 2, +b.l / 2};
  double dy[4] = {+b.w / 2, +b.w / 2, -b.w / 2, -b.w / 2};
  for (int i = 0; i < 4; ++i) {
    out[i] = {b.cx + dx[i] * c - dy[i] * s, b.cy + dx[i] * s + dy[i] * c};
  }
}

double IoU3D(const Box& a, const Box& b) {
  double dx = a.cx - b.cx, dy = a.cy - b.cy;
  double rr = 0.5 * (std::hypot(a.l, a.w) + std::hypot(b.l, b.w));
  if (dx * dx + dy * dy > rr * rr) return 0.0;
  Pt ca[4], cb[4];
  Corners(a, ca);
  Corners(b, cb);
  double inter_bev = PolyClipArea(ca, cb);
  double za0 = a.cz - a.h / 2, za1 = a.cz + a.h / 2;
  double zb0 = b.cz - b.h / 2, zb1 = b.cz + b.h / 2;
  double hov = std::max(0.0, std::min(za1, zb1) - std::max(za0, zb0));
  double inter = inter_bev * hov;
  double va = a.l * a.w * a.h, vb = b.l * b.w * b.h;
  double u = va + vb - inter;
  return u > 1e-9 ? inter / u : 0.0;
}

// ------------------------------------------------------------------ metric
double WrapAngle(double a) {
  while (a > M_PI) a -= 2 * M_PI;
  while (a < -M_PI) a += 2 * M_PI;
  return a;
}

struct PredResult {
  float score;
  int kind;       // 0 = FP, 1 = TP, 2 = ignored
  double hacc;    // heading accuracy for TPs
};

struct APResult {
  double ap = 0, aph = 0;
};

// Max-weight one-to-one assignment (Hungarian / Jonker-Volgenant style,
// O(n^3)) between rows (predictions) and cols (ground truths).
// benefit[i][j] < 0 marks a forbidden pair. Returns col index per row
// (-1 = unmatched); only pairs with benefit >= 0 are reported.
std::vector<int> MaxWeightAssign(const std::vector<std::vector<double>>& b) {
  int nr = int(b.size());
  int nc = nr ? int(b[0].size()) : 0;
  int n = std::max(nr, nc);
  if (n == 0) return {};
  // cost matrix (minimize), padded square. Forbidden/dummy pairs carry the
  // cost of a zero-IoU benefit (1.0), NOT a huge penalty: the official
  // Hungarian matcher maximizes the TOTAL matched IoU (below-threshold
  // pairs contribute zero weight and are filtered after the assignment) —
  // a huge forbidden cost would instead maximize match cardinality first,
  // which over-counts TPs whenever sacrificing one high-IoU pair enables
  // two mediocre ones (divergence caught by the numpy differential fuzz,
  // tests/test_waymo_metrics_differential.py).
  std::vector<std::vector<double>> a(n + 1,
                                     std::vector<double>(n + 1, 1.0));
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double w = (i < nr && j < nc) ? b[i][j] : -1.0;
      a[i + 1][j + 1] = (w >= 0) ? (1.0 - w) : 1.0;
    }
  // standard potentials-based Hungarian on rows
  std::vector<double> u(n + 1, 0), v(n + 1, 0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, 1e30);
    std::vector<char> used(n + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = -1;
      double delta = 1e30;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = a[i0][j] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  std::vector<int> match(nr, -1);
  for (int j = 1; j <= n; ++j) {
    int i = p[j];
    if (i >= 1 && i <= nr && j <= nc && b[i - 1][j - 1] >= 0)
      match[i - 1] = j - 1;
  }
  return match;
}

// Official-style AP integration: points ordered by increasing recall with
// the PASCAL/Waymo precision envelope (p(r) := max precision over points
// with recall >= r) applied first — without it the value at tied recalls
// depends on cutoff ordering (caught by the numpy differential fuzz). A
// recall gap beyond kRecallDelta contributes zero precision.
constexpr double kRecallDelta = 0.05;

double IntegrateAP(const std::vector<double>& recall,
                   std::vector<double> precision) {
  for (int i = int(precision.size()) - 2; i >= 0; --i)
    precision[i] = std::max(precision[i], precision[i + 1]);
  double ap = 0, last_r = 0;
  for (size_t i = 0; i < recall.size(); ++i) {
    double dr = recall[i] - last_r;
    if (dr <= 0) continue;
    ap += precision[i] * std::min(dr, kRecallDelta);
    last_r = recall[i];
  }
  return ap;
}

// level: 1 -> L2-only gt ignored; 2 -> all gt counted.
// range_lo/hi: breakdown shard on BEV center distance — GTs and
// predictions are sharded by their OWN box (official breakdown sharding).
APResult ComputeAP(const std::vector<Object>& preds,
                   const std::vector<Object>& gts, int cls, int level,
                   double iou_thresh, double range_lo, double range_hi,
                   int num_cutoffs = 100) {
  auto gt_level = [](const Object& g) {
    if (g.difficulty == 2) return 2;
    if (g.num_points >= 0 && g.num_points < 5) return 2;
    return 1;
  };
  auto in_range = [&](const Box& b) {
    double d = std::hypot(b.cx, b.cy);
    return d >= range_lo && d < range_hi;
  };

  // per-frame shards; GT out of the range shard is absent entirely,
  // difficulty above the level stays in the matching but is "ignored"
  struct Frame {
    std::vector<int> preds;              // sorted by descending score
    std::vector<int> gts;
    std::vector<char> gt_ignored;
    std::vector<std::vector<double>> iou;  // [pred][gt]
  };
  std::map<std::pair<std::string, int64_t>, Frame> frames;
  int num_gt = 0;
  for (size_t i = 0; i < gts.size(); ++i) {
    const Object& g = gts[i];
    if (g.type != cls || g.num_points == 0) continue;
    if (!in_range(g.box)) continue;
    bool ignored = (level == 1 && gt_level(g) == 2);
    Frame& f = frames[{g.context, g.ts}];
    f.gts.push_back(int(i));
    f.gt_ignored.push_back(ignored ? 1 : 0);
    if (!ignored) num_gt++;
  }
  std::vector<double> all_scores;
  for (size_t i = 0; i < preds.size(); ++i) {
    const Object& p = preds[i];
    if (p.type != cls || !in_range(p.box)) continue;
    frames[{p.context, p.ts}].preds.push_back(int(i));
    all_scores.push_back(p.score);
  }
  if (num_gt == 0 || all_scores.empty()) return {0.0, 0.0};

  for (auto& kv : frames) {
    Frame& f = kv.second;
    std::sort(f.preds.begin(), f.preds.end(), [&](int x, int y) {
      return preds[x].score > preds[y].score;
    });
    f.iou.assign(f.preds.size(),
                 std::vector<double>(f.gts.size(), 0.0));
    for (size_t i = 0; i < f.preds.size(); ++i)
      for (size_t j = 0; j < f.gts.size(); ++j)
        f.iou[i][j] = IoU3D(preds[f.preds[i]].box, gts[f.gts[j]].box);
  }

  // score cutoffs: quantiles of the shard's prediction scores
  // (DecideScoreCutoffs analog), evaluated from high to low
  std::sort(all_scores.begin(), all_scores.end());
  std::vector<double> cutoffs;
  int k = std::min<int>(num_cutoffs, int(all_scores.size()));
  for (int i = 0; i < k; ++i) {
    size_t idx = (k == 1) ? 0
                          : size_t((double(i) * (all_scores.size() - 1))
                                   / (k - 1));
    cutoffs.push_back(all_scores[idx]);
  }
  cutoffs.erase(std::unique(cutoffs.begin(), cutoffs.end()), cutoffs.end());
  std::sort(cutoffs.rbegin(), cutoffs.rend());  // descending

  std::vector<double> recall, precision, precision_h;
  for (double cutoff : cutoffs) {
    double tp = 0, fp = 0, tph = 0;
    for (auto& kv : frames) {
      Frame& f = kv.second;
      // predictions above the cutoff = prefix of the score-sorted list
      size_t m = 0;
      while (m < f.preds.size() && preds[f.preds[m]].score >= cutoff) ++m;
      if (m == 0) continue;
      std::vector<std::vector<double>> benefit(
          m, std::vector<double>(f.gts.size(), -1.0));
      for (size_t i = 0; i < m; ++i)
        for (size_t j = 0; j < f.gts.size(); ++j)
          if (f.iou[i][j] >= iou_thresh) benefit[i][j] = f.iou[i][j];
      std::vector<int> match = MaxWeightAssign(benefit);
      for (size_t i = 0; i < m; ++i) {
        int j = match[i];
        if (j < 0) {
          fp += 1;
        } else if (f.gt_ignored[j]) {
          // matched to above-difficulty GT: neither TP nor FP
        } else {
          const Object& p = preds[f.preds[i]];
          const Object& g = gts[f.gts[j]];
          double dh = WrapAngle(p.box.heading - g.box.heading);
          tp += 1;
          tph += std::max(0.0, 1.0 - std::fabs(dh) / M_PI);
        }
      }
    }
    if (tp + fp <= 0) continue;
    recall.push_back(tp / num_gt);
    precision.push_back(tp / (tp + fp));
    precision_h.push_back(tph / (tp + fp));
  }
  // order by increasing recall (descending cutoffs usually already are)
  std::vector<size_t> order(recall.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](size_t a, size_t b) {
    return recall[a] < recall[b];
  });
  std::vector<double> r2, p2, ph2;
  for (size_t idx : order) {
    r2.push_back(recall[idx]);
    p2.push_back(precision[idx]);
    ph2.push_back(precision_h[idx]);
  }
  APResult out;
  out.ap = IntegrateAP(r2, p2);
  out.aph = IntegrateAP(r2, ph2);
  return out;
}

const char* kTypeNames[] = {"UNKNOWN", "VEHICLE", "PEDESTRIAN", "SIGN",
                            "CYCLIST"};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <predictions.bin> <ground_truth.bin>\n", argv[0]);
    return 1;
  }
  std::vector<Object> preds = LoadObjects(argv[1]);
  std::vector<Object> gts = LoadObjects(argv[2]);
  std::fprintf(stderr, "loaded %zu predictions, %zu ground truths\n",
               preds.size(), gts.size());

  const double kInf = 1e18;
  struct Job {
    char line[128];
    int cls, level;
    double thr, lo, hi;
    APResult r;
  };
  std::vector<Job> jobs;
  // OBJECT_TYPE breakdown: Vehicle, Pedestrian, Sign, Cyclist x L1/L2
  for (int cls : {1, 2, 3, 4}) {
    double thr = (cls == 1) ? 0.7 : 0.5;
    for (int level : {1, 2}) {
      Job j{};
      std::snprintf(j.line, sizeof(j.line),
                    "OBJECT_TYPE_TYPE_%s_LEVEL_%d", kTypeNames[cls], level);
      j.cls = cls; j.level = level; j.thr = thr; j.lo = 0; j.hi = kInf;
      jobs.push_back(j);
    }
  }
  // RANGE breakdown
  const double lo[3] = {0, 30, 50};
  const double hi[3] = {30, 50, kInf};
  const char* rng_name[3] = {"[0, 30)", "[30, 50)", "[50, +inf)"};
  for (int cls : {1, 2, 3, 4}) {
    double thr = (cls == 1) ? 0.7 : 0.5;
    for (int b = 0; b < 3; ++b) {
      for (int level : {1, 2}) {
        Job j{};
        std::snprintf(j.line, sizeof(j.line), "RANGE_TYPE_%s_%s_LEVEL_%d",
                      kTypeNames[cls], rng_name[b], level);
        j.cls = cls; j.level = level; j.thr = thr; j.lo = lo[b];
        j.hi = hi[b];
        jobs.push_back(j);
      }
    }
  }
  // each breakdown is independent — run them across hardware threads
  unsigned nthreads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<size_t> next(0);
  std::vector<std::thread> pool;
  for (unsigned t = 0; t < std::min<size_t>(nthreads, jobs.size()); ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= jobs.size()) return;
        Job& j = jobs[i];
        j.r = ComputeAP(preds, gts, j.cls, j.level, j.thr, j.lo, j.hi);
      }
    });
  }
  for (auto& th : pool) th.join();
  for (const Job& j : jobs)
    std::printf("%s: [mAP %.6g] [mAPH %.6g]\n", j.line, j.r.ap, j.r.aph);
  return 0;
}
