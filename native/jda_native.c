/* jda_tpu native inference library.
 *
 * Standalone C11 implementation of the joint-cascade face detector with the
 * public API of the reference C library (/root/reference/c/jda.h) and
 * bit-identical numeric behaviour (growing-window scan, borrowed-memory
 * patches with width = window at every pyramid level, truncated float32
 * feature coordinates, sequential score chain, greedy input-order NMS).
 *
 * Design differences from the reference implementation (c/jda.c):
 *   - model geometry (T, K, landmarks, depth) comes from the file header
 *     instead of compile-time constants — any trained model loads;
 *   - the model is stored structure-of-arrays (one array per field over all
 *     T*K carts), mirroring jda_tpu's device layout;
 *   - the window scan is OpenMP-parallel over rows with per-row buffers
 *     concatenated in scan order, so output order and content match the
 *     serial reference exactly.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "jda.h"

#ifdef _OPENMP
#include <omp.h>
#endif

typedef struct {
  int T, K, landmark_n, depth;
  int node_n, leaf_n, dim; /* dim = 2 * landmark_n */
  /* per (cart, node): [T*K*node_n] */
  int *scale;
  int *lmk1, *lmk2; /* pre-doubled: index of the x coordinate in a shape */
  float *off1x, *off1y, *off2x, *off2y;
  int *feat_th;
  /* per cart: [T*K] */
  float *leaf_score; /* [T*K*leaf_n] */
  float *cart_th, *mean, *stdv;
  /* per stage: [T][K*leaf_n][dim] */
  float *W;
  float *mean_shape; /* [dim] */
} Cascade;

typedef struct {
  int w, h, stride;
  unsigned char *data;
} Image;

/* ------------------------------------------------------------------ */
/* model IO                                                            */
/* ------------------------------------------------------------------ */

static Cascade *cascade_alloc(int T, int K, int L, int depth) {
  Cascade *cc = (Cascade *)calloc(1, sizeof(Cascade));
  cc->T = T;
  cc->K = K;
  cc->landmark_n = L;
  cc->depth = depth;
  cc->leaf_n = 1 << (depth - 1);
  cc->node_n = cc->leaf_n - 1;
  cc->dim = 2 * L;
  size_t nodes = (size_t)T * K * cc->node_n;
  size_t carts = (size_t)T * K;
  cc->scale = (int *)malloc(nodes * sizeof(int));
  cc->lmk1 = (int *)malloc(nodes * sizeof(int));
  cc->lmk2 = (int *)malloc(nodes * sizeof(int));
  cc->off1x = (float *)malloc(nodes * sizeof(float));
  cc->off1y = (float *)malloc(nodes * sizeof(float));
  cc->off2x = (float *)malloc(nodes * sizeof(float));
  cc->off2y = (float *)malloc(nodes * sizeof(float));
  cc->feat_th = (int *)malloc(nodes * sizeof(int));
  cc->leaf_score = (float *)malloc(carts * cc->leaf_n * sizeof(float));
  cc->cart_th = (float *)malloc(carts * sizeof(float));
  cc->mean = (float *)malloc(carts * sizeof(float));
  cc->stdv = (float *)malloc(carts * sizeof(float));
  cc->W = (float *)malloc((size_t)T * K * cc->leaf_n * cc->dim * sizeof(float));
  cc->mean_shape = (float *)malloc(cc->dim * sizeof(float));
  return cc;
}

void jdaCascadorRelease(void *cascador) {
  Cascade *cc = (Cascade *)cascador;
  if (!cc) return;
  free(cc->scale);
  free(cc->lmk1);
  free(cc->lmk2);
  free(cc->off1x);
  free(cc->off1y);
  free(cc->off2x);
  free(cc->off2y);
  free(cc->feat_th);
  free(cc->leaf_score);
  free(cc->cart_th);
  free(cc->mean);
  free(cc->stdv);
  free(cc->W);
  free(cc->mean_shape);
  free(cc);
}

/* read helpers: wide = 1 reads float64, else float32 */
static float read_real(FILE *f, int wide, int *ok) {
  if (wide) {
    double v;
    if (fread(&v, sizeof(double), 1, f) != 1) *ok = 0;
    return (float)v;
  }
  float v;
  if (fread(&v, sizeof(float), 1, f) != 1) *ok = 0;
  return v;
}

static int read_i32(FILE *f, int *ok) {
  int v = 0;
  if (fread(&v, sizeof(int), 1, f) != 1) *ok = 0;
  return v;
}

static void *load(const char *path, int wide) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  int ok = 1;
  int hdr[7];
  if (fread(hdr, sizeof(int), 7, f) != 7) {
    fclose(f);
    return NULL;
  }
  int T = hdr[1], K = hdr[2], L = hdr[3], depth = hdr[4];
  if (T <= 0 || K <= 0 || L <= 0 || depth <= 1 || depth > 8) {
    fclose(f);
    return NULL;
  }
  Cascade *cc = cascade_alloc(T, K, L, depth);
  for (int i = 0; i < cc->dim; i++) cc->mean_shape[i] = read_real(f, wide, &ok);
  for (int t = 0; t < T; t++) {
    for (int k = 0; k < K; k++) {
      size_t c = (size_t)t * K + k;
      for (int j = 0; j < cc->node_n; j++) {
        size_t n = c * cc->node_n + j;
        cc->scale[n] = read_i32(f, &ok);
        cc->lmk1[n] = 2 * read_i32(f, &ok);
        cc->lmk2[n] = 2 * read_i32(f, &ok);
        cc->off1x[n] = read_real(f, wide, &ok);
        cc->off1y[n] = read_real(f, wide, &ok);
        cc->off2x[n] = read_real(f, wide, &ok);
        cc->off2y[n] = read_real(f, wide, &ok);
        cc->feat_th[n] = read_i32(f, &ok);
      }
      for (int j = 0; j < cc->leaf_n; j++)
        cc->leaf_score[c * cc->leaf_n + j] = read_real(f, wide, &ok);
      cc->cart_th[c] = read_real(f, wide, &ok);
      cc->mean[c] = read_real(f, wide, &ok);
      cc->stdv[c] = read_real(f, wide, &ok);
    }
    size_t wn = (size_t)K * cc->leaf_n * cc->dim;
    float *w = cc->W + (size_t)t * wn;
    for (size_t i = 0; i < wn; i++) w[i] = read_real(f, wide, &ok);
  }
  fclose(f);
  if (!ok) {
    jdaCascadorRelease(cc);
    return NULL;
  }
  return cc;
}

void *jdaCascadorCreateDouble(const char *model) { return load(model, 1); }
void *jdaCascadorCreateFloat(const char *model) { return load(model, 0); }

void jdaCascadorSerializeTo(void *cascador, const char *model) {
  Cascade *cc = (Cascade *)cascador;
  FILE *f = fopen(model, "wb");
  if (!f) return;
  int hdr[7] = {0, cc->T, cc->K, cc->landmark_n, cc->depth, cc->T + 1, -1};
  fwrite(hdr, sizeof(int), 7, f);
  fwrite(cc->mean_shape, sizeof(float), cc->dim, f);
  for (int t = 0; t < cc->T; t++) {
    for (int k = 0; k < cc->K; k++) {
      size_t c = (size_t)t * cc->K + k;
      for (int j = 0; j < cc->node_n; j++) {
        size_t n = c * cc->node_n + j;
        int l1 = cc->lmk1[n] / 2, l2 = cc->lmk2[n] / 2;
        fwrite(&cc->scale[n], sizeof(int), 1, f);
        fwrite(&l1, sizeof(int), 1, f);
        fwrite(&l2, sizeof(int), 1, f);
        fwrite(&cc->off1x[n], sizeof(float), 1, f);
        fwrite(&cc->off1y[n], sizeof(float), 1, f);
        fwrite(&cc->off2x[n], sizeof(float), 1, f);
        fwrite(&cc->off2y[n], sizeof(float), 1, f);
        fwrite(&cc->feat_th[n], sizeof(int), 1, f);
      }
      fwrite(cc->leaf_score + c * cc->leaf_n, sizeof(float), cc->leaf_n, f);
      fwrite(&cc->cart_th[c], sizeof(float), 1, f);
      fwrite(&cc->mean[c], sizeof(float), 1, f);
      fwrite(&cc->stdv[c], sizeof(float), 1, f);
    }
    fwrite(cc->W + (size_t)t * cc->K * cc->leaf_n * cc->dim, sizeof(float),
           (size_t)cc->K * cc->leaf_n * cc->dim, f);
  }
  int mask = 0;
  fwrite(&mask, sizeof(int), 1, f);
  fclose(f);
}

/* ------------------------------------------------------------------ */
/* image pyramid (bilinear, reference arithmetic: trunc ratios/output) */
/* ------------------------------------------------------------------ */

static Image image_resize(Image src, int w, int h) {
  Image out;
  out.w = out.stride = w;
  out.h = h;
  out.data = (unsigned char *)malloc((size_t)w * h);
  float xr = (float)(src.w - 1) / w;
  float yr = (float)(src.h - 1) / h;
  size_t o = 0;
  for (int i = 0; i < h; i++) {
    int y = (int)(yr * i);
    float dy = yr * i - y;
    const unsigned char *r0 = src.data + (size_t)y * src.stride;
    const unsigned char *r1 = r0 + src.stride;
    for (int j = 0; j < w; j++) {
      int x = (int)(xr * j);
      float dx = xr * j - x;
      float v = r0[x] * (1.f - dx) * (1.f - dy) + r0[x + 1] * dx * (1.f - dy) +
                r1[x] * (1.f - dx) * dy + r1[x + 1] * dx * dy;
      out.data[o++] = (unsigned char)v;
    }
  }
  return out;
}

/* ------------------------------------------------------------------ */
/* detection                                                           */
/* ------------------------------------------------------------------ */

typedef struct {
  int cap, n;
  int *bbox;     /* 3 per hit */
  float *shape;  /* dim per hit */
  float *score;  /* 1 per hit */
} Hits;

static void hits_init(Hits *hs, int dim) {
  hs->cap = 64;
  hs->n = 0;
  hs->bbox = (int *)malloc((size_t)hs->cap * 3 * sizeof(int));
  hs->shape = (float *)malloc((size_t)hs->cap * dim * sizeof(float));
  hs->score = (float *)malloc((size_t)hs->cap * sizeof(float));
}

static void hits_push(Hits *hs, int dim, int x, int y, int size,
                      const float *shape, float score) {
  if (hs->n == hs->cap) {
    hs->cap *= 2;
    hs->bbox = (int *)realloc(hs->bbox, (size_t)hs->cap * 3 * sizeof(int));
    hs->shape =
        (float *)realloc(hs->shape, (size_t)hs->cap * dim * sizeof(float));
    hs->score = (float *)realloc(hs->score, (size_t)hs->cap * sizeof(float));
  }
  hs->bbox[3 * hs->n] = x;
  hs->bbox[3 * hs->n + 1] = y;
  hs->bbox[3 * hs->n + 2] = size;
  memcpy(hs->shape + (size_t)hs->n * dim, shape, dim * sizeof(float));
  hs->score[hs->n] = score;
  hs->n++;
}

/* one window through the full cascade; returns 1 on acceptance */
static int validate(const Cascade *cc, const Image *ps, float *shape,
                    float *out_score, int *lbf, float final_th) {
  memcpy(shape, cc->mean_shape, cc->dim * sizeof(float));
  float score = 0.f;
  int node_n = cc->node_n;
  for (int t = 0; t < cc->T; t++) {
    size_t cart0 = (size_t)t * cc->K;
    for (int k = 0; k < cc->K; k++) {
      size_t c = cart0 + k;
      int node = 0;
      for (int d = 0; d < cc->depth - 1; d++) {
        size_t n = c * node_n + node;
        const Image *p = ps + cc->scale[n];
        int w = p->w;
        int l1 = cc->lmk1[n], l2 = cc->lmk2[n];
        int x1 = (int)((shape[l1] + cc->off1x[n]) * w);
        int y1 = (int)((shape[l1 + 1] + cc->off1y[n]) * w);
        int x2 = (int)((shape[l2] + cc->off2x[n]) * w);
        int y2 = (int)((shape[l2 + 1] + cc->off2y[n]) * w);
        x1 = x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1);
        y1 = y1 < 0 ? 0 : (y1 >= w ? w - 1 : y1);
        x2 = x2 < 0 ? 0 : (x2 >= w ? w - 1 : x2);
        y2 = y2 < 0 ? 0 : (y2 >= w ? w - 1 : y2);
        int v = (int)p->data[(size_t)y1 * p->stride + x1] -
                (int)p->data[(size_t)y2 * p->stride + x2];
        node = 2 * node + 1 + (v > cc->feat_th[n]);
      }
      int leaf = node - node_n;
      score = (score + cc->leaf_score[c * cc->leaf_n + leaf] - cc->mean[c]) /
              cc->stdv[c];
      if (score < cc->cart_th[c]) return 0;
      lbf[k] = k * cc->leaf_n + leaf;
    }
    const float *ws = cc->W + (size_t)t * cc->K * cc->leaf_n * cc->dim;
    for (int k = 0; k < cc->K; k++) {
      const float *w = ws + (size_t)lbf[k] * cc->dim;
      for (int i = 0; i < cc->dim; i++) shape[i] += w[i];
    }
  }
  if (score < final_th) return 0;
  *out_score = score;
  return 1;
}

jdaResult jdaDetect(void *cascador, unsigned char *data, int width, int height,
                    float scale, float step, int min_size, int max_size,
                    float th) {
  (void)step; /* the scan step is 0.1 * window, as in the reference */
  Cascade *cc = (Cascade *)cascador;
  Image o = {width, height, width, data};
  float r = 1.f / sqrtf(2.f);
  Image himg = image_resize(o, (int)(width * r), (int)(height * r));
  Image qimg = image_resize(o, width / 2, height / 2);

  if (min_size < 24) min_size = 24;
  if (max_size <= 0) max_size = width < height ? width : height;
  if (max_size > width) max_size = width;
  if (max_size > height) max_size = height;

  Hits all;
  hits_init(&all, cc->dim);

  int win = 24;
  while (win < min_size) win = (int)(win * scale);
  for (; win <= max_size; win = (int)(win * scale)) {
    int sstep = (int)(win * 0.1f);
    if (sstep < 1) sstep = 1;
    int y_max = height - win;
    int x_max = width - win;
    int ny = y_max / sstep + 1;

    Hits *rows = (Hits *)malloc((size_t)ny * sizeof(Hits));
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int yi = 0; yi < ny; yi++) {
      int y = yi * sstep;
      Hits *hs = rows + yi;
      hits_init(hs, cc->dim);
      float *shape = (float *)malloc(cc->dim * sizeof(float));
      int *lbf = (int *)malloc(cc->K * sizeof(int));
      int hy = (int)(y * r);
      int qy = y / 2;
      for (int x = 0; x <= x_max; x += sstep) {
        Image ps[3];
        ps[0].w = ps[0].h = win;
        ps[0].stride = o.stride;
        ps[0].data = o.data + (size_t)y * o.stride + x;
        ps[1].w = ps[1].h = win;
        ps[1].stride = himg.stride;
        ps[1].data = himg.data + (size_t)hy * himg.stride + (int)(x * r);
        ps[2].w = ps[2].h = win;
        ps[2].stride = qimg.stride;
        ps[2].data = qimg.data + (size_t)qy * qimg.stride + x / 2;
        float score;
        if (validate(cc, ps, shape, &score, lbf, th))
          hits_push(hs, cc->dim, x, y, win, shape, score);
      }
      free(shape);
      free(lbf);
    }
    for (int yi = 0; yi < ny; yi++) {
      Hits *hs = rows + yi;
      for (int i = 0; i < hs->n; i++)
        hits_push(&all, cc->dim, hs->bbox[3 * i], hs->bbox[3 * i + 1],
                  hs->bbox[3 * i + 2], hs->shape + (size_t)i * cc->dim,
                  hs->score[i]);
      free(hs->bbox);
      free(hs->shape);
      free(hs->score);
    }
    free(rows);
  }
  free(himg.data);
  free(qimg.data);

  /* greedy NMS, overlap 0.3, output keeps candidate order */
  int n = all.n;
  int *order = (int *)malloc((size_t)n * sizeof(int));
  char *keep = (char *)malloc((size_t)n);
  for (int i = 0; i < n; i++) {
    order[i] = i;
    keep[i] = 1;
  }
  /* stable score-descending order */
  for (int i = 0; i + 1 < n; i++)
    for (int j = i + 1; j < n; j++)
      if (all.score[order[i]] < all.score[order[j]]) {
        int tmp = order[i];
        order[i] = order[j];
        order[j] = tmp;
      }
  for (int i = 0; i + 1 < n; i++) {
    int a = order[i];
    if (!keep[a]) continue;
    long area_a = (long)all.bbox[3 * a + 2] * all.bbox[3 * a + 2];
    for (int j = i + 1; j < n; j++) {
      int b = order[j];
      if (!keep[b]) continue;
      int x1 = all.bbox[3 * a] > all.bbox[3 * b] ? all.bbox[3 * a]
                                                 : all.bbox[3 * b];
      int y1 = all.bbox[3 * a + 1] > all.bbox[3 * b + 1] ? all.bbox[3 * a + 1]
                                                         : all.bbox[3 * b + 1];
      int ax2 = all.bbox[3 * a] + all.bbox[3 * a + 2];
      int bx2 = all.bbox[3 * b] + all.bbox[3 * b + 2];
      int ay2 = all.bbox[3 * a + 1] + all.bbox[3 * a + 2];
      int by2 = all.bbox[3 * b + 1] + all.bbox[3 * b + 2];
      int x2 = ax2 < bx2 ? ax2 : bx2;
      int y2 = ay2 < by2 ? ay2 : by2;
      int w = x2 - x1 > 0 ? x2 - x1 : 0;
      int h = y2 - y1 > 0 ? y2 - y1 : 0;
      long area_b = (long)all.bbox[3 * b + 2] * all.bbox[3 * b + 2];
      float ov = (float)((long)w * h) / (float)(area_a + area_b - (long)w * h);
      if (ov > 0.3f) keep[b] = 0;
    }
  }

  jdaResult res;
  res.landmark_n = cc->landmark_n;
  int kept = 0;
  for (int i = 0; i < n; i++) kept += keep[i];
  res.n = kept;
  res.bboxes = (int *)malloc((size_t)kept * 3 * sizeof(int));
  res.shapes = (float *)malloc((size_t)kept * cc->dim * sizeof(float));
  res.scores = (float *)malloc((size_t)kept * sizeof(float));
  int m = 0;
  for (int i = 0; i < n; i++) {
    if (!keep[i]) continue;
    int x = all.bbox[3 * i], y = all.bbox[3 * i + 1], sz = all.bbox[3 * i + 2];
    res.bboxes[3 * m] = x;
    res.bboxes[3 * m + 1] = y;
    res.bboxes[3 * m + 2] = sz;
    float *dst = res.shapes + (size_t)m * cc->dim;
    const float *src = all.shape + (size_t)i * cc->dim;
    for (int j = 0; j < cc->landmark_n; j++) {
      dst[2 * j] = src[2 * j] * sz + x;
      dst[2 * j + 1] = src[2 * j + 1] * sz + y;
    }
    res.scores[m] = all.score[i];
    m++;
  }
  free(order);
  free(keep);
  free(all.bbox);
  free(all.shape);
  free(all.score);
  return res;
}

void jdaResultRelease(jdaResult result) {
  free(result.bboxes);
  free(result.shapes);
  free(result.scores);
}
