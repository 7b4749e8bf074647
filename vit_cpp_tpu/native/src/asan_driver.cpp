// ASan test driver for libvitnative: decode every file named on the
// command line (valid and deliberately malformed images) through the
// public C API, both the single-file and the threaded batch path.
//
// Built with -fsanitize=address by tools/asan_check.py — the CI-style
// "keep C++ host tools ASan-clean" check (SURVEY.md §5). Exit code 0 means
// no sanitizer report fired; decode failures are expected and fine.

#include <cstdint>
#include <cstdio>
#include <cstdlib>

extern "C" {
uint8_t *vn_decode_file(const char *path, int *w, int *h);
int vn_decode_batch(const char **paths, int n, int n_threads, uint8_t **outs,
                    int *ws, int *hs);
void vn_free(uint8_t *p);
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <image> [image...]\n", argv[0]);
        return 2;
    }
    const int n = argc - 1;
    // single-file path
    int ok = 0;
    for (int i = 0; i < n; ++i) {
        int w = 0, h = 0;
        uint8_t *p = vn_decode_file(argv[1 + i], &w, &h);
        if (p) {
            // touch first and last byte so ASan sees the full extent
            volatile uint8_t a = p[0];
            volatile uint8_t b = p[(size_t)w * h * 3 - 1];
            (void)a;
            (void)b;
            vn_free(p);
            ++ok;
        }
    }
    // threaded batch path
    const char **paths = (const char **)std::malloc(sizeof(char *) * n);
    uint8_t **outs = (uint8_t **)std::calloc(n, sizeof(uint8_t *));
    int *ws = (int *)std::calloc(n, sizeof(int));
    int *hs = (int *)std::calloc(n, sizeof(int));
    for (int i = 0; i < n; ++i) paths[i] = argv[1 + i];
    int bok = vn_decode_batch(paths, n, 4, outs, ws, hs);
    for (int i = 0; i < n; ++i)
        if (outs[i]) vn_free(outs[i]);
    std::free(paths);
    std::free(outs);
    std::free(ws);
    std::free(hs);
    std::printf("asan_driver: %d/%d single, %d/%d batch decoded\n", ok, n, bok,
                n);
    return 0;
}
