// Native FS-Mol task loader: gzip JSONL parsing + padded episode packing.
//
// The reference feeds its trainer through forked Python processes that
// gunzip + json.loads every task file (fs_mol/data/file_reader_iterable.py
// + fsmol_task.py:100-144). This library is the TPU build's native
// equivalent of that data-plane hot path: a single-pass C++ JSON parser
// over the gzip stream and an episode packer that writes the exact
// PackedGraphs buffer layout (adkf_ift_tpu/data/episodes.py), exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC fsmol_loader.cc -lz -o libfsmol_loader.so

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <utility>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON parser (subset: objects, arrays, numbers, strings, null/bool)
// specialized for flat numeric payloads — avoids building a DOM for the
// big arrays by parsing them straight into typed vectors.
// ---------------------------------------------------------------------------

struct Cursor {
  const char* p;
  const char* end;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r' || *p == ',')) ++p;
  }
  bool eat(char c) {
    skip_ws();
    if (p < end && *p == c) { ++p; return true; }
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
};

bool parse_string(Cursor& c, std::string* out) {
  c.skip_ws();
  if (c.p >= c.end || *c.p != '"') return false;
  ++c.p;
  out->clear();
  while (c.p < c.end && *c.p != '"') {
    if (*c.p == '\\' && c.p + 1 < c.end) {
      ++c.p;
      switch (*c.p) {
        case 'n': out->push_back('\n'); break;
        case 't': out->push_back('\t'); break;
        default: out->push_back(*c.p);
      }
    } else {
      out->push_back(*c.p);
    }
    ++c.p;
  }
  if (c.p >= c.end) return false;
  ++c.p;  // closing quote
  return true;
}

bool parse_double(Cursor& c, double* out) {
  c.skip_ws();
  // Accept bare JSON literals and NaN/Infinity that Python's json emits.
  if (c.p + 3 <= c.end && strncmp(c.p, "NaN", 3) == 0) { *out = NAN; c.p += 3; return true; }
  if (c.p + 8 <= c.end && strncmp(c.p, "Infinity", 8) == 0) { *out = INFINITY; c.p += 8; return true; }
  if (c.p + 9 <= c.end && strncmp(c.p, "-Infinity", 9) == 0) { *out = -INFINITY; c.p += 9; return true; }
  char* endp = nullptr;
  double v = strtod(c.p, &endp);
  if (endp == c.p) return false;
  c.p = endp;
  *out = v;
  return true;
}

bool skip_value(Cursor& c);  // fwd

bool skip_container(Cursor& c, char open, char close) {
  if (!c.eat(open)) return false;
  int depth = 1;
  bool in_str = false;
  while (c.p < c.end && depth > 0) {
    char ch = *c.p;
    if (in_str) {
      if (ch == '\\') ++c.p;
      else if (ch == '"') in_str = false;
    } else {
      if (ch == '"') in_str = true;
      else if (ch == open) ++depth;
      else if (ch == close) --depth;
    }
    ++c.p;
  }
  return depth == 0;
}

bool skip_value(Cursor& c) {
  c.skip_ws();
  if (c.p >= c.end) return false;
  char ch = *c.p;
  if (ch == '{') return skip_container(c, '{', '}');
  if (ch == '[') return skip_container(c, '[', ']');
  if (ch == '"') { std::string s; return parse_string(c, &s); }
  if (strncmp(c.p, "null", 4) == 0) { c.p += 4; return true; }
  if (strncmp(c.p, "true", 4) == 0) { c.p += 4; return true; }
  if (strncmp(c.p, "false", 5) == 0) { c.p += 5; return true; }
  double d;
  return parse_double(c, &d);
}

// Parse a flat numeric array into out (appending).
bool parse_num_array(Cursor& c, std::vector<float>* out) {
  if (!c.eat('[')) return false;
  while (!c.peek(']')) {
    double v;
    if (!parse_double(c, &v)) return false;
    out->push_back(static_cast<float>(v));
  }
  return c.eat(']');
}

bool parse_num_array_i32(Cursor& c, std::vector<int32_t>* out) {
  if (!c.eat('[')) return false;
  while (!c.peek(']')) {
    double v;
    if (!parse_double(c, &v)) return false;
    out->push_back(static_cast<int32_t>(v));
  }
  return c.eat(']');
}

// [[f,...],...] -> flattened, sets inner width.
bool parse_matrix(Cursor& c, std::vector<float>* out, int32_t* width) {
  if (!c.eat('[')) return false;
  *width = 0;
  while (!c.peek(']')) {
    size_t before = out->size();
    if (!parse_num_array(c, out)) return false;
    int32_t w = static_cast<int32_t>(out->size() - before);
    if (*width == 0) *width = w;
    else if (*width != w) return false;
  }
  return c.eat(']');
}

// [[[i,j],...] x T] -> per-type flat pair lists.
bool parse_adjacency(Cursor& c, std::vector<std::vector<int32_t>>* out) {
  if (!c.eat('[')) return false;
  out->clear();
  while (!c.peek(']')) {
    out->emplace_back();
    auto& pairs = out->back();
    if (!c.eat('[')) return false;
    while (!c.peek(']')) {
      if (!parse_num_array_i32(c, &pairs)) return false;
    }
    if (!c.eat(']')) return false;
  }
  return c.eat(']');
}

// ---------------------------------------------------------------------------
// Task model
// ---------------------------------------------------------------------------

constexpr int kNumEdgeTypes = 3;
constexpr int kFingerprintDim = 2048;
constexpr int kDescriptorDim = 42;

struct Molecule {
  std::vector<float> node_features;  // [V * F]
  int32_t num_nodes = 0;
  int32_t feature_dim = 0;
  std::vector<int32_t> adjacency[kNumEdgeTypes];  // flat (src, tgt) pairs
  std::vector<float> fingerprint;   // empty or kFingerprintDim
  std::vector<float> descriptors;   // empty or kDescriptorDim
  float bool_label = 0.0f;          // ±1
  double numeric_label = NAN;
};

struct Task {
  std::vector<Molecule> molecules;
  std::string name;
};

bool parse_graph(Cursor& c, Molecule* mol) {
  if (!c.eat('{')) return false;
  std::string key;
  while (!c.peek('}')) {
    if (!parse_string(c, &key) || !c.eat(':')) return false;
    if (key == "node_features") {
      std::vector<float> flat;
      int32_t width = 0;
      if (!parse_matrix(c, &flat, &width)) return false;
      mol->feature_dim = width;
      mol->num_nodes = width > 0 ? static_cast<int32_t>(flat.size()) / width : 0;
      mol->node_features = std::move(flat);
    } else if (key == "adjacency_lists") {
      std::vector<std::vector<int32_t>> adj;
      if (!parse_adjacency(c, &adj)) return false;
      for (int t = 0; t < kNumEdgeTypes && t < static_cast<int>(adj.size()); ++t)
        mol->adjacency[t] = std::move(adj[t]);
    } else {
      if (!skip_value(c)) return false;
    }
  }
  return c.eat('}');
}

bool parse_molecule(const char* line, size_t len, Molecule* mol) {
  Cursor c{line, line + len};
  if (!c.eat('{')) return false;
  std::string key, sval;
  while (!c.peek('}')) {
    if (!parse_string(c, &key) || !c.eat(':')) return false;
    if (key == "Property") {
      c.skip_ws();
      double v = 0.0;
      if (*c.p == '"') {
        if (!parse_string(c, &sval)) return false;
        v = atof(sval.c_str());
      } else if (!parse_double(c, &v)) {
        return false;
      }
      mol->bool_label = v > 0.5 ? 1.0f : -1.0f;
    } else if (key == "RegressionProperty") {
      c.skip_ws();
      if (*c.p == '"') {
        if (!parse_string(c, &sval)) return false;
        mol->numeric_label = atof(sval.c_str());
        if (sval == "nan" || sval == "NaN") mol->numeric_label = NAN;
      } else {
        double v;
        if (!parse_double(c, &v)) return false;
        mol->numeric_label = v;
      }
    } else if (key == "graph") {
      if (!parse_graph(c, mol)) return false;
    } else if (key == "fingerprints") {
      c.skip_ws();
      if (strncmp(c.p, "null", 4) == 0) { c.p += 4; }
      else if (!parse_num_array(c, &mol->fingerprint)) return false;
    } else if (key == "descriptors") {
      c.skip_ws();
      if (strncmp(c.p, "null", 4) == 0) { c.p += 4; }
      else if (!parse_num_array(c, &mol->descriptors)) return false;
    } else {
      if (!skip_value(c)) return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Load a (possibly gzipped) JSONL task file. Returns an opaque handle.
void* fsmol_load_task(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  auto* task = new Task();
  std::string line;
  std::vector<char> buf(1 << 20);
  while (true) {
    line.clear();
    bool eof = false;
    while (true) {
      if (gzgets(f, buf.data(), static_cast<int>(buf.size())) == nullptr) { eof = true; break; }
      line += buf.data();
      if (!line.empty() && line.back() == '\n') break;
    }
    if (!line.empty()) {
      Molecule mol;
      if (parse_molecule(line.c_str(), line.size(), &mol)) {
        task->molecules.push_back(std::move(mol));
      }
    }
    if (eof) break;
  }
  gzclose(f);
  if (task->molecules.empty()) { delete task; return nullptr; }
  // Task name = basename up to ".jsonl" (task_name_from_path semantics).
  std::string base(path);
  size_t slash = base.find_last_of('/');
  if (slash != std::string::npos) base = base.substr(slash + 1);
  size_t ext = base.find(".jsonl");
  if (ext != std::string::npos) base = base.substr(0, ext);
  task->name = base;
  return task;
}

const char* fsmol_task_name(void* handle) {
  return static_cast<Task*>(handle)->name.c_str();
}

void fsmol_free_task(void* handle) { delete static_cast<Task*>(handle); }

int32_t fsmol_num_molecules(void* handle) {
  return static_cast<int32_t>(static_cast<Task*>(handle)->molecules.size());
}

int32_t fsmol_num_nodes(void* handle, int32_t i) {
  return static_cast<Task*>(handle)->molecules[i].num_nodes;
}

int32_t fsmol_feature_dim(void* handle, int32_t i) {
  return static_cast<Task*>(handle)->molecules[i].feature_dim;
}

float fsmol_bool_label(void* handle, int32_t i) {
  return static_cast<Task*>(handle)->molecules[i].bool_label;
}

double fsmol_numeric_label(void* handle, int32_t i) {
  return static_cast<Task*>(handle)->molecules[i].numeric_label;
}

int32_t fsmol_num_edges(void* handle, int32_t i, int32_t type) {
  const auto& adj = static_cast<Task*>(handle)->molecules[i].adjacency[type];
  return static_cast<int32_t>(adj.size() / 2);
}

// Copy raw per-molecule data (for Python-side Task reconstruction).
void fsmol_copy_node_features(void* handle, int32_t i, float* out) {
  const auto& m = static_cast<Task*>(handle)->molecules[i];
  memcpy(out, m.node_features.data(), m.node_features.size() * sizeof(float));
}

void fsmol_copy_edges(void* handle, int32_t i, int32_t type, int32_t* out) {
  const auto& adj = static_cast<Task*>(handle)->molecules[i].adjacency[type];
  memcpy(out, adj.data(), adj.size() * sizeof(int32_t));
}

void fsmol_copy_fingerprint(void* handle, int32_t i, float* out) {
  const auto& fp = static_cast<Task*>(handle)->molecules[i].fingerprint;
  if (fp.empty()) memset(out, 0, kFingerprintDim * sizeof(float));
  else memcpy(out, fp.data(), fp.size() * sizeof(float));
}

void fsmol_copy_descriptors(void* handle, int32_t i, float* out) {
  const auto& d = static_cast<Task*>(handle)->molecules[i].descriptors;
  if (d.empty()) memset(out, 0, kDescriptorDim * sizeof(float));
  else memcpy(out, d.data(), d.size() * sizeof(float));
}

// Pack a set of molecules (by index) into the PackedGraphs buffer layout
// (data/episodes.py pack_graphs semantics: contiguous node packing,
// pre-bidirectionalized edges, dummy-slot padding). Returns 0 on
// success, negative on budget overflow.
int32_t fsmol_pack(
    void* handle,
    const int32_t* indices, int32_t n_indices,
    int32_t num_graphs, int32_t node_budget,
    const int32_t* edge_budgets,  // [kNumEdgeTypes]
    // outputs (caller-allocated, pre-zeroed not required):
    float* node_features,   // [node_budget * F]
    int32_t* node_to_graph, // [node_budget]
    float* node_mask,       // [node_budget]
    int32_t** edge_sources, // per type [edge_budgets[t]]
    int32_t** edge_targets,
    float** edge_mask,
    float* fingerprints,    // [num_graphs * kFingerprintDim]
    float* descriptors,     // [num_graphs * kDescriptorDim]
    float* graph_mask,      // [num_graphs]
    float* bool_labels,     // [num_graphs] (±1, zero-padded)
    double* numeric_labels, // [num_graphs]
    int32_t feature_dim) {
  auto* task = static_cast<Task*>(handle);
  if (n_indices > num_graphs) return -1;

  memset(node_features, 0, static_cast<size_t>(node_budget) * feature_dim * sizeof(float));
  for (int32_t v = 0; v < node_budget; ++v) node_to_graph[v] = num_graphs;
  memset(node_mask, 0, node_budget * sizeof(float));
  const int32_t dummy = node_budget - 1;
  for (int t = 0; t < kNumEdgeTypes; ++t) {
    for (int32_t e = 0; e < edge_budgets[t]; ++e) {
      edge_sources[t][e] = dummy;
      edge_targets[t][e] = dummy;
      edge_mask[t][e] = 0.0f;
    }
  }
  memset(fingerprints, 0, static_cast<size_t>(num_graphs) * kFingerprintDim * sizeof(float));
  memset(descriptors, 0, static_cast<size_t>(num_graphs) * kDescriptorDim * sizeof(float));
  memset(graph_mask, 0, num_graphs * sizeof(float));
  memset(bool_labels, 0, num_graphs * sizeof(float));
  memset(numeric_labels, 0, num_graphs * sizeof(double));

  int32_t node_offset = 0;
  int32_t edge_offsets[kNumEdgeTypes] = {0, 0, 0};
  for (int32_t gi = 0; gi < n_indices; ++gi) {
    const Molecule& m = task->molecules[indices[gi]];
    if (m.feature_dim != feature_dim) return -2;
    const int32_t v = m.num_nodes;
    if (node_offset + v > node_budget - 1) return -3;
    memcpy(node_features + static_cast<size_t>(node_offset) * feature_dim,
           m.node_features.data(), static_cast<size_t>(v) * feature_dim * sizeof(float));
    for (int32_t k = 0; k < v; ++k) {
      node_to_graph[node_offset + k] = gi;
      node_mask[node_offset + k] = 1.0f;
    }
    for (int t = 0; t < kNumEdgeTypes; ++t) {
      const auto& adj = m.adjacency[t];
      const int32_t e = static_cast<int32_t>(adj.size() / 2);
      if (e == 0) continue;
      int32_t eo = edge_offsets[t];
      if (eo + 2 * e > edge_budgets[t]) return -4;
      for (int32_t k = 0; k < e; ++k) {
        const int32_t s = adj[2 * k] + node_offset;
        const int32_t d = adj[2 * k + 1] + node_offset;
        edge_sources[t][eo + k] = s;
        edge_targets[t][eo + k] = d;
        edge_sources[t][eo + e + k] = d;
        edge_targets[t][eo + e + k] = s;
        edge_mask[t][eo + k] = 1.0f;
        edge_mask[t][eo + e + k] = 1.0f;
      }
      edge_offsets[t] = eo + 2 * e;
    }
    if (!m.fingerprint.empty())
      memcpy(fingerprints + static_cast<size_t>(gi) * kFingerprintDim,
             m.fingerprint.data(), m.fingerprint.size() * sizeof(float));
    if (!m.descriptors.empty())
      memcpy(descriptors + static_cast<size_t>(gi) * kDescriptorDim,
             m.descriptors.data(), m.descriptors.size() * sizeof(float));
    graph_mask[gi] = 1.0f;
    bool_labels[gi] = m.bool_label;
    numeric_labels[gi] = m.numeric_label;
    node_offset += v;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Prefetching task queue — the reference's BufferedFileReaderIterable
// (fs_mol/data/file_reader_iterable.py:63-311: N workers, bounded output
// queue, per-epoch shuffle, skip-unreadable-and-continue, repeat) moved
// entirely into C++ worker threads: path dispensing, gzip+JSON parsing,
// and buffering all happen off the Python thread (no GIL involvement).
// Each popped task carries the same idx contract as the Python
// BackgroundReader (epoch * num_paths + position) so seeded episode
// sampling is unchanged.
// ---------------------------------------------------------------------------

namespace {

struct TaskQueue {
  std::vector<std::string> paths;
  int capacity = 16;
  bool repeat = false;
  bool do_shuffle = true;
  int64_t seed = 0;

  std::mutex mu;
  std::condition_variable cv_pop;   // consumer waits: item available / all done
  std::condition_variable cv_push;  // workers wait: queue below capacity
  std::deque<std::pair<Task*, int64_t>> items;
  std::vector<size_t> order;
  size_t pos = 0;
  int64_t epoch = 0;
  bool stopping = false;
  int live_workers = 0;
  std::vector<std::thread> threads;

  void reshuffle_locked() {
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    if (do_shuffle) {
      std::mt19937_64 rng(static_cast<uint64_t>(seed + epoch));
      std::shuffle(order.begin(), order.end(), rng);
    }
  }

  bool next_path(std::string* path, int64_t* idx) {
    std::unique_lock<std::mutex> lk(mu);
    if (stopping) return false;
    if (pos >= order.size()) {
      if (!repeat || order.empty()) return false;
      ++epoch;
      pos = 0;
      reshuffle_locked();
    }
    *idx = epoch * static_cast<int64_t>(order.empty() ? 1 : order.size()) +
           static_cast<int64_t>(pos);
    *path = paths[order[pos]];
    ++pos;
    return true;
  }

  void work_loop() {
    std::string path;
    int64_t idx;
    while (next_path(&path, &idx)) {
      Task* t = static_cast<Task*>(fsmol_load_task(path.c_str()));
      if (t == nullptr) continue;  // unreadable file: skip, keep streaming
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return stopping || static_cast<int>(items.size()) < capacity; });
      if (stopping) {
        lk.unlock();
        delete t;
        return;
      }
      items.emplace_back(t, idx);
      cv_pop.notify_one();
    }
  }

  void worker() {
    work_loop();
    std::unique_lock<std::mutex> lk(mu);
    --live_workers;
    if (live_workers == 0) cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* fsmol_queue_create(
    const char** paths, int32_t n_paths, int32_t n_workers,
    int32_t capacity, int32_t repeat, int32_t shuffle, int64_t seed) {
  auto* q = new TaskQueue();
  q->paths.reserve(n_paths);
  for (int32_t i = 0; i < n_paths; ++i) q->paths.emplace_back(paths[i]);
  q->capacity = capacity > 0 ? capacity : 16;
  q->repeat = repeat != 0;
  q->do_shuffle = shuffle != 0;
  q->seed = seed;
  q->reshuffle_locked();  // no threads yet, lock not needed
  const int workers = n_workers > 0 ? n_workers : 1;
  q->live_workers = workers;
  for (int i = 0; i < workers; ++i) q->threads.emplace_back([q] { q->worker(); });
  return q;
}

// Blocks until a task is available; returns nullptr when the stream is
// exhausted (non-repeat) or the queue was destroyed. The caller owns the
// returned Task handle (free with fsmol_free_task).
void* fsmol_queue_next(void* handle, int64_t* idx_out) {
  auto* q = static_cast<TaskQueue*>(handle);
  std::unique_lock<std::mutex> lk(q->mu);
  q->cv_pop.wait(lk, [&] { return q->stopping || !q->items.empty() || q->live_workers == 0; });
  if (q->items.empty()) return nullptr;
  auto item = q->items.front();
  q->items.pop_front();
  q->cv_push.notify_one();
  if (idx_out != nullptr) *idx_out = item.second;
  return item.first;
}

void fsmol_queue_destroy(void* handle) {
  auto* q = static_cast<TaskQueue*>(handle);
  {
    std::unique_lock<std::mutex> lk(q->mu);
    q->stopping = true;
  }
  q->cv_push.notify_all();
  q->cv_pop.notify_all();
  for (auto& t : q->threads) t.join();
  for (auto& item : q->items) delete item.first;
  delete q;
}

}  // extern "C"
