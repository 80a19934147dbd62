// fastcsv: multithreaded columnar CSV parser with a C ABI for ctypes.
//
// The TPU-native framework's input pipeline is columnar (data/dataset.py);
// this parser loads a numeric CSV straight into per-column contiguous
// buffers (int64 or double), splitting the file across hardware threads at
// line boundaries. Replaces the pandas read_csv hot path for the benchmark
// datasets (Ali-CCP full is 85M rows — parse throughput matters there).
//
// C ABI (consumed by scenario_wise_rec_tpu/data/native/__init__.py):
//   void*       csv_open(const char* path, int nthreads);
//   long long   csv_nrows(void*);
//   int         csv_ncols(void*);
//   const char* csv_colname(void*, int col);
//   int         csv_coltype(void*, int col);   // 0 = int64, 1 = double
//   void        csv_copy_col(void*, int col, void* dst);
//   const char* csv_error(void*);
//   void        csv_close(void*);
//
// Build: make -C scenario_wise_rec_tpu/data/native  (g++ -O3 -fPIC -shared)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Column {
  std::string name;
  bool is_int = true;
  std::vector<int64_t> ints;
  std::vector<double> dbls;
};

struct Table {
  std::vector<Column> cols;
  int64_t nrows = 0;
  std::string error;
};

// Parse one chunk [begin, end) of the buffer (begin at a line start) into
// per-column vectors. Values are parsed as double; intness tracked per cell.
struct Chunk {
  std::vector<std::vector<double>> vals;
  std::vector<char> all_int;  // per column
  int64_t rows = 0;
};

void parse_chunk(const char* begin, const char* end, size_t ncols, Chunk* out) {
  out->vals.assign(ncols, {});
  out->all_int.assign(ncols, 1);
  const char* p = begin;
  while (p < end) {
    size_t col = 0;
    while (p < end && *p != '\n') {
      // parse one field
      char* next = nullptr;
      double v = strtod(p, &next);
      bool is_int = true;
      if (next == p) {  // empty / non-numeric field -> 0
        v = 0.0;
        while (p < end && *p != ',' && *p != '\n') ++p;
      } else {
        for (const char* q = p; q < next; ++q) {
          if (*q == '.' || *q == 'e' || *q == 'E') { is_int = false; break; }
        }
        p = next;
        if (p < end && *p == '\r') ++p;
      }
      if (col < ncols) {
        out->vals[col].push_back(v);
        if (!is_int) out->all_int[col] = 0;
      }
      ++col;
      if (p < end && *p == ',') ++p;
    }
    if (p < end) ++p;  // skip '\n'
    if (col > 0) ++out->rows;
  }
}

}  // namespace

extern "C" {

void* csv_open(const char* path, int nthreads) {
  auto* t = new Table();
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    t->error = std::string("cannot open ") + path;
    return t;
  }
  const std::streamsize size = f.tellg();
  f.seekg(0);
  std::vector<char> buf(static_cast<size_t>(size));
  f.read(buf.data(), size);

  // header
  size_t pos = 0;
  while (pos < buf.size() && buf[pos] != '\n') ++pos;
  {
    std::string header(buf.data(), pos);
    if (!header.empty() && header.back() == '\r') header.pop_back();
    size_t start = 0;
    while (true) {
      size_t comma = header.find(',', start);
      Column c;
      c.name = header.substr(start, comma == std::string::npos
                                        ? std::string::npos
                                        : comma - start);
      t->cols.push_back(std::move(c));
      if (comma == std::string::npos) break;
      start = comma + 1;
    }
  }
  ++pos;  // past header newline
  const size_t ncols = t->cols.size();

  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 1;
  }
  // split at line boundaries
  std::vector<size_t> bounds{pos};
  const size_t body = buf.size() - pos;
  for (int i = 1; i < nthreads; ++i) {
    size_t target = pos + body * i / nthreads;
    while (target < buf.size() && buf[target] != '\n') ++target;
    if (target < buf.size()) ++target;
    bounds.push_back(target);
  }
  bounds.push_back(buf.size());

  std::vector<Chunk> chunks(bounds.size() - 1);
  std::vector<std::thread> workers;
  for (size_t i = 0; i + 1 < bounds.size(); ++i) {
    workers.emplace_back(parse_chunk, buf.data() + bounds[i],
                         buf.data() + bounds[i + 1], ncols, &chunks[i]);
  }
  for (auto& w : workers) w.join();

  // column types: int iff every chunk saw only ints
  for (size_t c = 0; c < ncols; ++c) {
    bool is_int = true;
    for (auto& ch : chunks)
      if (c < ch.all_int.size() && !ch.all_int[c]) is_int = false;
    t->cols[c].is_int = is_int;
  }
  for (auto& ch : chunks) t->nrows += ch.rows;
  for (size_t c = 0; c < ncols; ++c) {
    auto& col = t->cols[c];
    if (col.is_int) col.ints.reserve(t->nrows);
    else col.dbls.reserve(t->nrows);
    for (auto& ch : chunks) {
      for (double v : ch.vals[c]) {
        if (col.is_int) col.ints.push_back(static_cast<int64_t>(v));
        else col.dbls.push_back(v);
      }
    }
  }
  // ragged-row sanity
  for (auto& col : t->cols) {
    size_t n = col.is_int ? col.ints.size() : col.dbls.size();
    if (static_cast<int64_t>(n) != t->nrows) {
      t->error = "ragged rows in " + std::string(path);
      break;
    }
  }
  return t;
}

long long csv_nrows(void* h) { return static_cast<Table*>(h)->nrows; }
int csv_ncols(void* h) {
  return static_cast<int>(static_cast<Table*>(h)->cols.size());
}
const char* csv_colname(void* h, int col) {
  return static_cast<Table*>(h)->cols[col].name.c_str();
}
int csv_coltype(void* h, int col) {
  return static_cast<Table*>(h)->cols[col].is_int ? 0 : 1;
}
void csv_copy_col(void* h, int col, void* dst) {
  auto& c = static_cast<Table*>(h)->cols[col];
  if (c.is_int)
    std::memcpy(dst, c.ints.data(), c.ints.size() * sizeof(int64_t));
  else
    std::memcpy(dst, c.dbls.data(), c.dbls.size() * sizeof(double));
}
const char* csv_error(void* h) {
  auto& e = static_cast<Table*>(h)->error;
  return e.empty() ? nullptr : e.c_str();
}
void csv_close(void* h) { delete static_cast<Table*>(h); }

}  // extern "C"
