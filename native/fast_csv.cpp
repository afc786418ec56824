// fast_csv — multi-threaded CSV loader + joint label encoder.
//
// Native data-pipeline backend for mmlrec_tpu (the reference is pure
// pandas/sklearn; utils/data_utils.py:14-94).  Parses one or two CSV files
// (train [+ test] — the reference label-encodes them JOINTLY,
// data_utils.py:41-42), then for each requested column either:
//   * numeric column  -> float64 values
//   * categorical     -> int32 codes in sorted-unique order (sklearn
//                        LabelEncoder semantics: numeric sort if every value
//                        parses as a number, else lexicographic)
//
// Exposed through a minimal C ABI (ctypes-friendly); all allocation happens
// here and is released with fc_free().
//
// Build: make -C native   (g++ -O3 -std=c++17 -shared -fPIC -pthread)

#include <algorithm>
#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Table {
  std::vector<std::string> header;
  // cells[col][row]
  std::vector<std::vector<std::string>> cells;
  int64_t rows = 0;
};

// Split a CSV line honoring double quotes (RFC-4180 basics).
void split_line(const std::string& line, std::vector<std::string>& out) {
  out.clear();
  std::string cur;
  bool quoted = false;
  for (size_t i = 0; i < line.size(); ++i) {
    char c = line[i];
    if (quoted) {
      if (c == '"') {
        if (i + 1 < line.size() && line[i + 1] == '"') {
          cur.push_back('"');
          ++i;
        } else {
          quoted = false;
        }
      } else {
        cur.push_back(c);
      }
    } else if (c == '"') {
      quoted = true;
    } else if (c == ',') {
      out.push_back(cur);
      cur.clear();
    } else if (c != '\r') {
      cur.push_back(c);
    }
  }
  out.push_back(cur);
}

bool parse_table(const char* path, Table& t) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return false;
  std::string line;
  if (!std::getline(in, line)) return false;
  split_line(line, t.header);
  const size_t ncol = t.header.size();
  t.cells.assign(ncol, {});

  // Read all remaining lines, then parse in parallel.
  std::vector<std::string> lines;
  while (std::getline(in, line)) {
    if (!line.empty()) lines.push_back(std::move(line));
  }
  const int64_t n = static_cast<int64_t>(lines.size());
  t.rows = n;
  for (auto& col : t.cells) col.resize(n);

  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = std::max(1u, std::min(hw ? hw : 4u, 16u));
  std::vector<std::thread> workers;
  std::vector<bool> ok(nthreads, true);
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int w = 0; w < nthreads; ++w) {
    workers.emplace_back([&, w]() {
      std::vector<std::string> fields;
      int64_t lo = w * chunk, hi = std::min<int64_t>(n, lo + chunk);
      for (int64_t r = lo; r < hi; ++r) {
        split_line(lines[r], fields);
        if (fields.size() != ncol) {
          ok[w] = false;
          fields.resize(ncol);
        }
        for (size_t c = 0; c < ncol; ++c) t.cells[c][r] = std::move(fields[c]);
      }
    });
  }
  for (auto& th : workers) th.join();
  for (bool o : ok)
    if (!o) return false;
  return true;
}

bool to_double(const std::string& s, double& v) {
  if (s.empty()) return false;
  const char* p = s.c_str();
  char* end = nullptr;
  errno = 0;
  v = std::strtod(p, &end);
  if (errno || end == p) return false;
  while (*end == ' ') ++end;
  return *end == '\0';
}

struct Column {
  int kind = 0;  // 0 = float values, 1 = categorical codes
  std::vector<double> values;
  std::vector<int32_t> codes;
  int32_t vocab = 0;
};

// sklearn LabelEncoder: classes_ = sorted unique; pandas infers a numeric
// dtype when every value parses, giving numeric sort order.
void encode_categorical(const std::vector<std::string>& cells, Column& col) {
  const int64_t n = static_cast<int64_t>(cells.size());
  bool all_numeric = true;
  std::vector<double> nums(n);
  for (int64_t i = 0; i < n; ++i) {
    if (!to_double(cells[i], nums[i])) {
      all_numeric = false;
      break;
    }
  }
  col.kind = 1;
  col.codes.resize(n);
  if (all_numeric) {
    std::vector<double> uniq(nums);
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    std::unordered_map<double, int32_t> idx;
    idx.reserve(uniq.size() * 2);
    for (size_t i = 0; i < uniq.size(); ++i) idx[uniq[i]] = (int32_t)i;
    for (int64_t i = 0; i < n; ++i) col.codes[i] = idx[nums[i]];
    col.vocab = (int32_t)uniq.size();
  } else {
    std::vector<const std::string*> uniq_src;
    {
      std::unordered_map<std::string, int32_t> seen;
      seen.reserve(n * 2);
      for (int64_t i = 0; i < n; ++i) seen.emplace(cells[i], 0);
      std::vector<std::string> uniq;
      uniq.reserve(seen.size());
      for (auto& kv : seen) uniq.push_back(kv.first);
      std::sort(uniq.begin(), uniq.end());
      std::unordered_map<std::string, int32_t> idx;
      idx.reserve(uniq.size() * 2);
      for (size_t i = 0; i < uniq.size(); ++i) idx[uniq[i]] = (int32_t)i;
      for (int64_t i = 0; i < n; ++i) col.codes[i] = idx[cells[i]];
      col.vocab = (int32_t)idx.size();
    }
    (void)uniq_src;
  }
}

void parse_float_column(const std::vector<std::string>& cells, Column& col) {
  const int64_t n = static_cast<int64_t>(cells.size());
  col.kind = 0;
  col.values.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    double v = 0.0;
    to_double(cells[i], v);
    col.values[i] = v;
  }
}

struct Result {
  int64_t rows = 0;
  int64_t train_rows = 0;
  std::vector<Column> columns;  // in requested order
  std::string error;
};

}  // namespace

extern "C" {

// Parse train_path (+ optional test_path, may be null/empty).  columns is a
// '\n'-joined list of column names; kinds[i]: 0 float, 1 categorical.
// Returns an opaque handle or null on error.
void* fc_load(const char* train_path, const char* test_path,
              const char* columns, const int32_t* kinds, int32_t ncols) {
  auto* res = new Result();
  Table train;
  if (!parse_table(train_path, train)) {
    res->error = "failed to parse train csv";
    return res;
  }
  Table test;
  bool have_test = test_path && test_path[0];
  if (have_test && !parse_table(test_path, test)) {
    res->error = "failed to parse test csv";
    return res;
  }
  res->train_rows = train.rows;
  res->rows = train.rows + (have_test ? test.rows : 0);

  std::unordered_map<std::string, size_t> tr_idx, te_idx;
  for (size_t i = 0; i < train.header.size(); ++i) tr_idx[train.header[i]] = i;
  for (size_t i = 0; i < test.header.size(); ++i) te_idx[test.header[i]] = i;

  std::vector<std::string> names;
  {
    std::stringstream ss(columns);
    std::string item;
    while (std::getline(ss, item, '\n'))
      if (!item.empty()) names.push_back(item);
  }
  if ((int32_t)names.size() != ncols) {
    res->error = "column count mismatch";
    return res;
  }

  res->columns.resize(ncols);
  std::vector<std::thread> workers;
  std::vector<std::string> errs(ncols);
  for (int32_t c = 0; c < ncols; ++c) {
    workers.emplace_back([&, c]() {
      auto it = tr_idx.find(names[c]);
      if (it == tr_idx.end()) {
        errs[c] = "missing column " + names[c];
        return;
      }
      std::vector<std::string> joint = train.cells[it->second];
      if (have_test) {
        auto jt = te_idx.find(names[c]);
        if (jt == te_idx.end()) {
          errs[c] = "missing column in test " + names[c];
          return;
        }
        const auto& tc = test.cells[jt->second];
        joint.insert(joint.end(), tc.begin(), tc.end());
      }
      if (kinds[c] == 0)
        parse_float_column(joint, res->columns[c]);
      else
        encode_categorical(joint, res->columns[c]);
    });
  }
  for (auto& th : workers) th.join();
  for (auto& e : errs)
    if (!e.empty()) {
      res->error = e;
      return res;
    }
  return res;
}

const char* fc_error(void* handle) {
  auto* res = static_cast<Result*>(handle);
  return res->error.empty() ? nullptr : res->error.c_str();
}

int64_t fc_rows(void* handle) { return static_cast<Result*>(handle)->rows; }
int64_t fc_train_rows(void* handle) {
  return static_cast<Result*>(handle)->train_rows;
}

int32_t fc_vocab(void* handle, int32_t col) {
  return static_cast<Result*>(handle)->columns[col].vocab;
}

// Copy column data into caller-provided buffers.
void fc_read_floats(void* handle, int32_t col, double* out) {
  auto& c = static_cast<Result*>(handle)->columns[col];
  std::memcpy(out, c.values.data(), c.values.size() * sizeof(double));
}

void fc_read_codes(void* handle, int32_t col, int32_t* out) {
  auto& c = static_cast<Result*>(handle)->columns[col];
  std::memcpy(out, c.codes.data(), c.codes.size() * sizeof(int32_t));
}

void fc_free(void* handle) { delete static_cast<Result*>(handle); }

}  // extern "C"
