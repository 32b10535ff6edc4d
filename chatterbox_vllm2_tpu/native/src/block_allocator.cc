// KV-cache block allocator: the native runtime core for the paged KV cache.
//
// TPU-native analog of the block manager behind vLLM's PagedAttention
// (reference consumes it implicitly; SURVEY.md §2.2).  The device side is a
// Pallas kernel reading pages through a block table; this C++ side owns the
// free list and per-sequence page maps, and is deliberately allocation-free
// on the hot path (fixed arrays, O(1) alloc/free per block).
//
// Exposed as a flat C API for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Allocator {
  int32_t num_blocks;
  int32_t max_seqs;
  int32_t blocks_per_seq;
  // free list as a stack
  std::vector<int32_t> free_stack;
  int32_t free_top;  // number of free blocks
  // per-sequence block tables: [max_seqs, blocks_per_seq], -1 = unassigned
  std::vector<int32_t> tables;
  std::vector<int32_t> seq_len_blocks;  // blocks held per seq
};

inline int32_t* table_row(Allocator* a, int32_t seq) {
  return a->tables.data() + static_cast<size_t>(seq) * a->blocks_per_seq;
}

}  // namespace

extern "C" {

void* cbx_allocator_new(int32_t num_blocks, int32_t max_seqs,
                        int32_t blocks_per_seq) {
  if (num_blocks <= 0 || max_seqs <= 0 || blocks_per_seq <= 0) return nullptr;
  auto* a = new Allocator();
  a->num_blocks = num_blocks;
  a->max_seqs = max_seqs;
  a->blocks_per_seq = blocks_per_seq;
  a->free_stack.resize(num_blocks);
  // hand out low block ids first (stable tests, better locality)
  for (int32_t i = 0; i < num_blocks; ++i)
    a->free_stack[i] = num_blocks - 1 - i;
  a->free_top = num_blocks;
  a->tables.assign(static_cast<size_t>(max_seqs) * blocks_per_seq, -1);
  a->seq_len_blocks.assign(max_seqs, 0);
  return a;
}

void cbx_allocator_delete(void* h) { delete static_cast<Allocator*>(h); }

int32_t cbx_num_free(void* h) { return static_cast<Allocator*>(h)->free_top; }

int32_t cbx_seq_num_blocks(void* h, int32_t seq) {
  auto* a = static_cast<Allocator*>(h);
  if (seq < 0 || seq >= a->max_seqs) return -1;
  return a->seq_len_blocks[seq];
}

// Grow `seq` to hold at least `n` blocks.  Returns 0 on success, -1 on OOM or
// bad args.  All-or-nothing: on OOM nothing is allocated.
int32_t cbx_seq_reserve(void* h, int32_t seq, int32_t n) {
  auto* a = static_cast<Allocator*>(h);
  if (seq < 0 || seq >= a->max_seqs || n < 0 || n > a->blocks_per_seq)
    return -1;
  int32_t have = a->seq_len_blocks[seq];
  int32_t need = n - have;
  if (need <= 0) return 0;
  if (need > a->free_top) return -1;
  int32_t* row = table_row(a, seq);
  for (int32_t i = 0; i < need; ++i)
    row[have + i] = a->free_stack[--a->free_top];
  a->seq_len_blocks[seq] = n;
  return 0;
}

// Release all blocks held by `seq`.
void cbx_seq_release(void* h, int32_t seq) {
  auto* a = static_cast<Allocator*>(h);
  if (seq < 0 || seq >= a->max_seqs) return;
  int32_t* row = table_row(a, seq);
  for (int32_t i = 0; i < a->seq_len_blocks[seq]; ++i) {
    a->free_stack[a->free_top++] = row[i];
    row[i] = -1;
  }
  a->seq_len_blocks[seq] = 0;
}

// Copy the (padded, -1-filled) block table for `seq` into out[cap].
int32_t cbx_seq_table(void* h, int32_t seq, int32_t* out, int32_t cap) {
  auto* a = static_cast<Allocator*>(h);
  if (seq < 0 || seq >= a->max_seqs || cap < a->blocks_per_seq) return -1;
  std::memcpy(out, table_row(a, seq),
              sizeof(int32_t) * a->blocks_per_seq);
  return a->seq_len_blocks[seq];
}

// Copy the full [max_seqs, blocks_per_seq] table (row-major) into out.
int32_t cbx_full_table(void* h, int32_t* out, int64_t cap) {
  auto* a = static_cast<Allocator*>(h);
  int64_t n = static_cast<int64_t>(a->max_seqs) * a->blocks_per_seq;
  if (cap < n) return -1;
  std::memcpy(out, a->tables.data(), sizeof(int32_t) * n);
  return 0;
}

}  // extern "C"
