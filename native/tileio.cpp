// Memory-mapped matrix tile I/O engine.
//
// Native data-loader for the out-of-memory GEMM path: matrices live in
// binary files (row-major), tiles are gathered/scattered through mmap with
// multithreaded row copies and readahead hints.  This extends the
// host-DRAM staging loop (gemm_hls_tpu/parallel/staging.py) one more level
// down the memory hierarchy — disk -> host DRAM -> HBM -> VMEM — the same
// outer-tile streaming scheme the reference runs between DDR and BRAM
// (reference kernel/Memory.cpp), re-based twice.
//
// C ABI for ctypes (gemm_hls_tpu/utils/tileio.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MatrixFile {
  int fd = -1;
  uint8_t* base = nullptr;
  int64_t rows = 0;
  int64_t cols = 0;
  int64_t itemsize = 0;
  bool writable = false;

  int64_t bytes() const { return rows * cols * itemsize; }
};

void copy_rows(const MatrixFile* m, int64_t r0, int64_t r1, int64_t c0,
               int64_t c1, uint8_t* dst, int64_t dst_stride, bool to_file) {
  const int64_t row_bytes = (c1 - c0) * m->itemsize;
  for (int64_t r = r0; r < r1; ++r) {
    uint8_t* file_ptr = m->base + (r * m->cols + c0) * m->itemsize;
    uint8_t* buf_ptr = dst + (r - r0) * dst_stride;
    if (to_file) {
      std::memcpy(file_ptr, buf_ptr, row_bytes);
    } else {
      std::memcpy(buf_ptr, file_ptr, row_bytes);
    }
  }
}

int transfer_tile(MatrixFile* m, int64_t r0, int64_t r1, int64_t c0,
                  int64_t c1, void* buf, int n_threads, bool to_file) {
  if (!m || !m->base) return 1;
  if (r0 < 0 || c0 < 0 || r1 > m->rows || c1 > m->cols || r0 > r1 || c0 > c1)
    return 2;
  if (to_file && !m->writable) return 3;
  const int64_t n_rows = r1 - r0;
  const int64_t dst_stride = (c1 - c0) * m->itemsize;
  if (!to_file) {
    // Hint the kernel to read ahead the touched span.
    uint8_t* lo = m->base + (r0 * m->cols + c0) * m->itemsize;
    uint8_t* hi = m->base + ((r1 - 1) * m->cols + c1) * m->itemsize;
    const long page = sysconf(_SC_PAGESIZE);
    uintptr_t start = reinterpret_cast<uintptr_t>(lo) / page * page;
    madvise(reinterpret_cast<void*>(start),
            reinterpret_cast<uintptr_t>(hi) - start, MADV_WILLNEED);
  }
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, std::max<int64_t>(n_rows, 1)));
  if (n_threads == 1) {
    copy_rows(m, r0, r1, c0, c1, static_cast<uint8_t*>(buf), dst_stride,
              to_file);
    return 0;
  }
  std::vector<std::thread> pool;
  const int64_t per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t a = r0 + t * per;
    const int64_t b = std::min(r1, a + per);
    if (a >= b) break;
    pool.emplace_back(copy_rows, m, a, b, c0, c1,
                      static_cast<uint8_t*>(buf) + (a - r0) * dst_stride,
                      dst_stride, to_file);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // namespace

extern "C" {

// Rejects non-positive dims and rows*cols*itemsize overflow.
bool bad_geometry(int64_t rows, int64_t cols, int64_t itemsize) {
  if (rows <= 0 || cols <= 0 || itemsize <= 0) return true;
  if (rows > INT64_MAX / cols) return true;
  return rows * cols > INT64_MAX / itemsize;
}

void* tileio_open(const char* path, int64_t rows, int64_t cols,
                  int64_t itemsize, int writable) {
  if (bad_geometry(rows, cols, itemsize)) return nullptr;
  auto* m = new MatrixFile();
  m->rows = rows;
  m->cols = cols;
  m->itemsize = itemsize;
  m->writable = writable != 0;
  m->fd = open(path, writable ? O_RDWR : O_RDONLY);
  if (m->fd < 0) {
    delete m;
    return nullptr;
  }
  // A file smaller than the declared geometry would mmap fine but SIGBUS
  // the whole process on first access past EOF; fail the open instead.
  struct stat st;
  if (fstat(m->fd, &st) != 0 ||
      static_cast<int64_t>(st.st_size) < m->bytes()) {
    close(m->fd);
    delete m;
    return nullptr;
  }
  m->base = static_cast<uint8_t*>(
      mmap(nullptr, m->bytes(), writable ? PROT_READ | PROT_WRITE : PROT_READ,
           MAP_SHARED, m->fd, 0));
  if (m->base == MAP_FAILED) {
    close(m->fd);
    delete m;
    return nullptr;
  }
  return m;
}

void* tileio_create(const char* path, int64_t rows, int64_t cols,
                    int64_t itemsize) {
  if (bad_geometry(rows, cols, itemsize)) return nullptr;
  const int fd = open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, rows * cols * itemsize) != 0) {
    close(fd);
    return nullptr;
  }
  close(fd);
  return tileio_open(path, rows, cols, itemsize, 1);
}

int tileio_read_tile(void* handle, int64_t r0, int64_t r1, int64_t c0,
                     int64_t c1, void* dst, int n_threads) {
  return transfer_tile(static_cast<MatrixFile*>(handle), r0, r1, c0, c1, dst,
                       n_threads, false);
}

int tileio_write_tile(void* handle, int64_t r0, int64_t r1, int64_t c0,
                      int64_t c1, void* src, int n_threads) {
  return transfer_tile(static_cast<MatrixFile*>(handle), r0, r1, c0, c1, src,
                       n_threads, true);
}

void tileio_close(void* handle) {
  auto* m = static_cast<MatrixFile*>(handle);
  if (!m) return;
  if (m->base && m->base != MAP_FAILED) munmap(m->base, m->bytes());
  if (m->fd >= 0) close(m->fd);
  delete m;
}

}  // extern "C"
