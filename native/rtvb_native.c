/* Native runtime support for rtvb_tpu.
 *
 * The reference implements its IO/runtime layer in C++ (stb_image_write PNG
 * encoding, std::execution::par batched frame writes in
 * OfflineBackend.cpp:133-184, FNV-1a chunk hashing in
 * WorldSceneManager.cpp:240-279).  This is the TPU build's native
 * equivalent: a small C library loaded via ctypes (no pybind11 in the
 * toolchain), with pure-Python fallbacks when the .so is absent.
 *
 *   - rtvb_fnv1a64:      FNV-1a 64-bit over a byte buffer
 *   - rtvb_write_png:    8-bit RGB PNG writer (zlib deflate, filter 0)
 *   - rtvb_write_pngs:   batch writer encoding N frames on worker threads
 *                        (the std::execution::par analog)
 *
 * Build: `make -C native` (produces native/librtvb_native.so).
 */
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

/* ---------------------------------------------------------------- FNV-1a */

uint64_t rtvb_fnv1a64(const uint8_t *data, uint64_t n) {
    uint64_t h = 0xcbf29ce484222325ULL;
    for (uint64_t i = 0; i < n; i++) {
        h ^= data[i];
        h *= 0x100000001b3ULL;
    }
    return h;
}

/* ------------------------------------------------------------------- PNG */

static void put_be32(uint8_t *p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)v;
}

static int write_chunk(FILE *f, const char tag[4], const uint8_t *data,
                       uint32_t n) {
    uint8_t hdr[8];
    uint8_t crcb[4];
    uint32_t crc;
    put_be32(hdr, n);
    memcpy(hdr + 4, tag, 4);
    if (fwrite(hdr, 1, 8, f) != 8) return -1;
    if (n && fwrite(data, 1, n, f) != n) return -1;
    crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, (const uint8_t *)tag, 4);
    if (n) crc = crc32(crc, data, n);
    put_be32(crcb, crc);
    return fwrite(crcb, 1, 4, f) == 4 ? 0 : -1;
}

/* rgb: H*W*3 bytes, row-major.  Returns 0 on success. */
int rtvb_write_png(const char *path, int w, int h, const uint8_t *rgb) {
    const uint64_t stride = (uint64_t)w * 3;
    const uint64_t raw_n = ((uint64_t)h) * (stride + 1);
    uint8_t *raw = (uint8_t *)malloc(raw_n);
    uLongf comp_cap;
    uint8_t *comp;
    uint8_t ihdr[13];
    FILE *f;
    int rc = -1;
    if (!raw) return -1;
    for (int y = 0; y < h; y++) {
        raw[(stride + 1) * (uint64_t)y] = 0; /* filter: none */
        memcpy(raw + (stride + 1) * (uint64_t)y + 1, rgb + stride * (uint64_t)y,
               stride);
    }
    comp_cap = compressBound(raw_n);
    comp = (uint8_t *)malloc(comp_cap);
    if (!comp) { free(raw); return -1; }
    if (compress2(comp, &comp_cap, raw, raw_n, 6) != Z_OK) goto done;

    f = fopen(path, "wb");
    if (!f) goto done;
    if (fwrite("\x89PNG\r\n\x1a\n", 1, 8, f) != 8) goto close_done;
    put_be32(ihdr, (uint32_t)w);
    put_be32(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;   /* bit depth */
    ihdr[9] = 2;   /* color type: RGB */
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    if (write_chunk(f, "IHDR", ihdr, 13)) goto close_done;
    if (write_chunk(f, "IDAT", comp, (uint32_t)comp_cap)) goto close_done;
    if (write_chunk(f, "IEND", NULL, 0)) goto close_done;
    rc = 0;
close_done:
    fclose(f);
done:
    free(raw);
    free(comp);
    return rc;
}

/* ------------------------------------------- parallel batch PNG encoding */

typedef struct {
    const char *const *paths;
    const uint8_t *const *frames;
    int w, h, n;
    int next;          /* work queue cursor */
    int failures;
    pthread_mutex_t mu;
} batch_t;

static void *batch_worker(void *arg) {
    batch_t *b = (batch_t *)arg;
    for (;;) {
        int i;
        pthread_mutex_lock(&b->mu);
        i = b->next < b->n ? b->next++ : -1;
        pthread_mutex_unlock(&b->mu);
        if (i < 0) return NULL;
        if (rtvb_write_png(b->paths[i], b->w, b->h, b->frames[i]) != 0) {
            pthread_mutex_lock(&b->mu);
            b->failures++;
            pthread_mutex_unlock(&b->mu);
        }
    }
}

/* Encode n frames (all w×h RGB) to paths[] using up to `threads` workers.
 * Returns the number of failed writes. */
int rtvb_write_pngs(const char *const *paths, const uint8_t *const *frames,
                    int w, int h, int n, int threads) {
    batch_t b;
    pthread_t tids[64];
    int nt = threads < 1 ? 1 : (threads > 64 ? 64 : threads);
    if (nt > n) nt = n;
    b.paths = paths;
    b.frames = frames;
    b.w = w;
    b.h = h;
    b.n = n;
    b.next = 0;
    b.failures = 0;
    pthread_mutex_init(&b.mu, NULL);
    for (int t = 0; t < nt; t++)
        pthread_create(&tids[t], NULL, batch_worker, &b);
    for (int t = 0; t < nt; t++)
        pthread_join(tids[t], NULL);
    pthread_mutex_destroy(&b.mu);
    return b.failures;
}
