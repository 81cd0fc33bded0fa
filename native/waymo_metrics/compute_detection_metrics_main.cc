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
//   * greedy score-ordered one-to-one matching per frame,
//   * AP from the monotone precision envelope over the recall axis; APH
//     weights each true positive by heading accuracy
//     1 - |wrap(dh)| / pi,
//   * breakdowns: OBJECT_TYPE and RANGE ([0,30), [30,50), [50,inf) by
//     BEV center distance), printed in the official output format parsed by
//     the reference's evaluate() (waymo_tracklet_dataset.py:394-401).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
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

// level: 1 -> L2-only gt ignored; 2 -> all gt counted.
// range_lo/hi: breakdown filter on GT center distance; predictions filter
// on their own center distance (standard waymo breakdown behavior).
APResult ComputeAP(const std::vector<Object>& preds,
                   const std::vector<Object>& gts, int cls, int level,
                   double iou_thresh, double range_lo, double range_hi) {
  // bucket by frame
  std::map<std::pair<std::string, int64_t>, std::vector<int>> gt_by_frame;
  for (size_t i = 0; i < gts.size(); ++i) {
    const Object& g = gts[i];
    if (g.type != cls) continue;
    if (g.num_points == 0) continue;  // never evaluated
    gt_by_frame[{g.context, g.ts}].push_back(int(i));
  }
  auto gt_level = [](const Object& g) {
    if (g.difficulty == 2) return 2;
    if (g.num_points >= 0 && g.num_points < 5) return 2;
    return 1;
  };
  auto in_range = [&](const Box& b) {
    double d = std::hypot(b.cx, b.cy);
    return d >= range_lo && d < range_hi;
  };

  int num_gt = 0;
  for (auto& kv : gt_by_frame)
    for (int gi : kv.second) {
      const Object& g = gts[gi];
      if (!in_range(g.box)) continue;
      if (level == 1 && gt_level(g) == 2) continue;
      num_gt++;
    }

  std::vector<PredResult> results;
  // per frame greedy matching in score order
  std::map<std::pair<std::string, int64_t>, std::vector<int>> pred_by_frame;
  for (size_t i = 0; i < preds.size(); ++i) {
    const Object& p = preds[i];
    if (p.type != cls) continue;
    pred_by_frame[{p.context, p.ts}].push_back(int(i));
  }
  for (auto& kv : pred_by_frame) {
    auto& pl = kv.second;
    std::sort(pl.begin(), pl.end(), [&](int x, int y) {
      return preds[x].score > preds[y].score;
    });
    auto git = gt_by_frame.find(kv.first);
    std::vector<int> gl = git == gt_by_frame.end() ? std::vector<int>()
                                                   : git->second;
    std::vector<bool> used(gl.size(), false);
    for (int pi : pl) {
      const Object& p = preds[pi];
      double best_iou = iou_thresh;
      int best = -1;
      for (size_t j = 0; j < gl.size(); ++j) {
        if (used[j]) continue;
        double iou = IoU3D(p.box, gts[gl[j]].box);
        if (iou >= best_iou) {
          best_iou = iou;
          best = int(j);
        }
      }
      if (best >= 0) {
        used[best] = true;
        const Object& g = gts[gl[best]];
        bool gt_counted = in_range(g.box) &&
                          !(level == 1 && gt_level(g) == 2);
        if (!gt_counted) {
          results.push_back({p.score, 2, 0.0});  // ignored
        } else {
          double dh = WrapAngle(p.box.heading - g.box.heading);
          double hacc = std::max(0.0, 1.0 - std::fabs(dh) / M_PI);
          results.push_back({p.score, 1, hacc});
        }
      } else {
        if (!in_range(p.box)) {
          results.push_back({p.score, 2, 0.0});  // outside breakdown
        } else {
          results.push_back({p.score, 0, 0.0});
        }
      }
    }
  }

  if (num_gt == 0) return {0.0, 0.0};
  std::sort(results.begin(), results.end(),
            [](const PredResult& a, const PredResult& b) {
              return a.score > b.score;
            });
  std::vector<double> recall, precision, precision_h;
  double tp = 0, fp = 0, tph = 0;
  for (const auto& r : results) {
    if (r.kind == 2) continue;
    if (r.kind == 1) {
      tp += 1;
      tph += r.hacc;
    } else {
      fp += 1;
    }
    recall.push_back(tp / num_gt);
    precision.push_back(tp / (tp + fp));
    precision_h.push_back(tph / (tp + fp));
  }
  // monotone envelope + trapezoid-free staircase integration
  for (int i = int(precision.size()) - 2; i >= 0; --i) {
    precision[i] = std::max(precision[i], precision[i + 1]);
    precision_h[i] = std::max(precision_h[i], precision_h[i + 1]);
  }
  APResult out;
  double prev_r = 0;
  for (size_t i = 0; i < recall.size(); ++i) {
    double dr = recall[i] - prev_r;
    if (dr > 0) {
      out.ap += dr * precision[i];
      out.aph += dr * precision_h[i];
      prev_r = recall[i];
    }
  }
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
  // OBJECT_TYPE breakdown: Vehicle, Pedestrian, Sign, Cyclist x L1/L2
  for (int cls : {1, 2, 3, 4}) {
    double thr = (cls == 1) ? 0.7 : (cls == 3 ? 0.5 : 0.5);
    for (int level : {1, 2}) {
      APResult r = ComputeAP(preds, gts, cls, level, thr, 0, kInf);
      std::printf("OBJECT_TYPE_TYPE_%s_LEVEL_%d: [mAP %.6g] [mAPH %.6g]\n",
                  kTypeNames[cls], level, r.ap, r.aph);
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
        APResult r = ComputeAP(preds, gts, cls, level, thr, lo[b], hi[b]);
        std::printf(
            "RANGE_TYPE_%s_%s_LEVEL_%d: [mAP %.6g] [mAPH %.6g]\n",
            kTypeNames[cls], rng_name[b], level, r.ap, r.aph);
      }
    }
  }
  return 0;
}
