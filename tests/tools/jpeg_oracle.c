/* Tiny libjpeg driver used ONLY by tests to produce and cross-check
 * arithmetic-coding interop fixtures (tests/test_jpeg_arith.py).  The
 * reference project decodes JPEGs through cv2 -> libjpeg, so libjpeg IS
 * the parity oracle for our pure-Python codec.  This tool is compiled
 * on demand by the test suite when gcc + jpeglib are present; the
 * committed fixtures it produced keep the pins hermetic elsewhere.
 *
 * usage:
 *   jpeg_oracle encode in.raw W H NC quality arith prog restart out.jpg
 *   jpeg_oracle decode in.jpg out.raw          (prints "W H NC")
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "jpeg_oracle: %s\n", m); exit(1); }

static unsigned char *read_all(const char *path, long *n) {
  FILE *f = fopen(path, "rb");
  if (!f) die("cannot open input");
  fseek(f, 0, SEEK_END); *n = ftell(f); fseek(f, 0, SEEK_SET);
  unsigned char *buf = malloc(*n);
  if (fread(buf, 1, *n, f) != (size_t)*n) die("short read");
  fclose(f);
  return buf;
}

int main(int argc, char **argv) {
  if (argc == 11 && !strcmp(argv[1], "encode")) {
    long n; unsigned char *raw = read_all(argv[2], &n);
    int w = atoi(argv[3]), h = atoi(argv[4]), nc = atoi(argv[5]);
    int q = atoi(argv[6]), arith = atoi(argv[7]), prog = atoi(argv[8]);
    int restart = atoi(argv[9]);
    if (n < (long)w * h * nc) die("raw too small");
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    FILE *out = fopen(argv[10], "wb");
    if (!out) die("cannot open output");
    jpeg_stdio_dest(&c, out);
    c.image_width = w; c.image_height = h;
    c.input_components = nc;
    c.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, q, TRUE);
    c.arith_code = arith ? TRUE : FALSE;
    if (prog) jpeg_simple_progression(&c);
    c.restart_interval = restart;
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
      JSAMPROW row = raw + (size_t)c.next_scanline * w * nc;
      jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(out);
    return 0;
  }
  if (argc == 4 && !strcmp(argv[1], "decode")) {
    long n; unsigned char *jpg = read_all(argv[2], &n);
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, jpg, n);
    if (jpeg_read_header(&d, TRUE) != JPEG_HEADER_OK) die("bad header");
    jpeg_start_decompress(&d);
    int w = d.output_width, h = d.output_height, nc = d.output_components;
    unsigned char *out = malloc((size_t)w * h * nc);
    while ((int)d.output_scanline < h) {
      JSAMPROW row = out + (size_t)d.output_scanline * w * nc;
      jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    FILE *f = fopen(argv[3], "wb");
    if (!f) die("cannot open output");
    fwrite(out, 1, (size_t)w * h * nc, f);
    fclose(f);
    printf("%d %d %d\n", w, h, nc);
    return 0;
  }
  die("usage: encode|decode");
  return 1;
}
