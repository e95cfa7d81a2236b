// Self-test for the prefetch queue, built under ThreadSanitizer
// (`make tsan`) — the framework's race-detection story for its only
// threaded component (SURVEY.md §5: JAX compute is functional; host ingest
// is the sole concurrency surface).

#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* eav_prefetch_create(int);
void eav_prefetch_submit(void*, const char*);
int eav_prefetch_pop(void*, char*, int, float**, int*, long*, int*);
void eav_prefetch_destroy(void*);
void eav_free(void*);
const char* eav_last_error();
int eav_read_wav(const char*, float**, int*, long*, int*);
}

static void write_test_wav(const std::string& path, int sr, int n) {
  FILE* f = fopen(path.c_str(), "wb");
  assert(f);
  int data_len = n * 2;
  int riff_len = 36 + data_len;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_len, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  int fmt_len = 16;
  fwrite(&fmt_len, 4, 1, f);
  short fmt = 1, ch = 1, bits = 16, align = 2;
  int rate = sr, brate = sr * 2;
  fwrite(&fmt, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&brate, 4, 1, f);
  fwrite(&align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_len, 4, 1, f);
  for (int i = 0; i < n; ++i) {
    short v = (short)(i % 1000);
    fwrite(&v, 2, 1, f);
  }
  fclose(f);
}

int main() {
  const int kFiles = 32;
  std::vector<std::string> paths;
  for (int i = 0; i < kFiles; ++i) {
    std::string p = "/tmp/eav_tsan_" + std::to_string(i) + ".wav";
    write_test_wav(p, 16000, 1000 + i);
    paths.push_back(p);
  }
  void* q = eav_prefetch_create(4);
  for (auto& p : paths) eav_prefetch_submit(q, p.c_str());
  int got = 0;
  for (int i = 0; i < kFiles; ++i) {
    char path[4096];
    float* data = nullptr;
    int ch = 0, sr = 0;
    long n = 0;
    int rc = eav_prefetch_pop(q, path, sizeof(path), &data, &ch, &n, &sr);
    assert(rc == 0);
    assert(ch == 1 && sr == 16000 && n >= 1000);
    eav_free(data);
    got++;
  }
  eav_prefetch_destroy(q);
  for (auto& p : paths) remove(p.c_str());
  printf("queue_test: %d decodes OK\n", got);
  return 0;
}
