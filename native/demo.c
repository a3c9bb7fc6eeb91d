/* Native library demo (the reference's c/main.cpp uses OpenCV; this one is
 * dependency-free): load a model, detect over a binary PGM (P5) image,
 * time repeated runs, print boxes.
 *
 *   ./jda-demo model.bin image.pgm [reps]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "jda.h"

static unsigned char *read_pgm(const char *path, int *w, int *h) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  char magic[3] = {0};
  int maxv;
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) {
    fclose(f);
    return NULL;
  }
  /* skip comments */
  int c;
  do {
    while ((c = fgetc(f)) == '#')
      while ((c = fgetc(f)) != '\n' && c != EOF) {}
  } while (c == '\n' || c == ' ');
  ungetc(c, f);
  if (fscanf(f, "%d %d %d", w, h, &maxv) != 3) {
    fclose(f);
    return NULL;
  }
  fgetc(f); /* single whitespace */
  unsigned char *data = (unsigned char *)malloc((size_t)(*w) * (*h));
  size_t got = fread(data, 1, (size_t)(*w) * (*h), f);
  fclose(f);
  if (got != (size_t)(*w) * (*h)) {
    free(data);
    return NULL;
  }
  return data;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s model image.pgm [reps]\n", argv[0]);
    return 1;
  }
  void *cc = jdaCascadorCreateDouble(argv[1]);
  if (!cc) cc = jdaCascadorCreateFloat(argv[1]);
  if (!cc) {
    fprintf(stderr, "can not load model %s\n", argv[1]);
    return 1;
  }
  int w, h;
  unsigned char *img = read_pgm(argv[2], &w, &h);
  if (!img) {
    fprintf(stderr, "can not read PGM %s\n", argv[2]);
    return 1;
  }
  int reps = argc > 3 ? atoi(argv[3]) : 10;

  jdaResult res = jdaDetect(cc, img, w, h, 1.25f, 0.1f, 40, -1, -0.5f);
  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  for (int i = 0; i < reps; i++) {
    jdaResultRelease(res);
    res = jdaDetect(cc, img, w, h, 1.25f, 0.1f, 40, -1, -0.5f);
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double dt =
      (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
  printf("%d faces, %.2f ms/image\n", res.n, dt / reps * 1e3);
  for (int i = 0; i < res.n; i++)
    printf("  %d %d %d  %.4f\n", res.bboxes[3 * i], res.bboxes[3 * i + 1],
           res.bboxes[3 * i + 2], res.scores[i]);
  jdaResultRelease(res);
  jdaCascadorRelease(cc);
  free(img);
  return 0;
}
