/* jda_tpu native inference library — public C API.
 *
 * Drop-in compatible with the reference C API (/root/reference/c/jda.h):
 * same symbol names, same jdaResult layout, same numeric behaviour.
 * The implementation (jda_native.c) is a fresh design: structure-of-arrays
 * model storage, geometry read from the model header instead of compile-time
 * constants, and OpenMP row-parallel scanning with deterministic output
 * order.
 */
#ifndef JDA_TPU_NATIVE_H
#define JDA_TPU_NATIVE_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  int n;           /* number of faces */
  int landmark_n;  /* landmarks per face */
  int *bboxes;     /* (x, y, size) per face */
  float *shapes;   /* (x1, y1, ...) per face, absolute image coords */
  float *scores;   /* cascade score per face */
} jdaResult;

/* Load a binary model (double = trainer format, float = compact format).
 * Returns NULL on failure. */
void *jdaCascadorCreateDouble(const char *model);
void *jdaCascadorCreateFloat(const char *model);

/* Write the float32 compact model format. */
void jdaCascadorSerializeTo(void *cascador, const char *model);

void jdaCascadorRelease(void *cascador);

/* Multi-scale sliding-window detection over an 8-bit gray image.
 * scale: window growth factor per octave step
 * step:  accepted for API compatibility (the scan step is 0.1 * window,
 *        matching the reference implementation)
 * min_size / max_size: window size bounds (max_size <= 0 = image bound)
 * th:    final score threshold */
jdaResult jdaDetect(void *cascador, unsigned char *data, int width, int height,
                    float scale, float step, int min_size, int max_size,
                    float th);

void jdaResultRelease(jdaResult result);

#ifdef __cplusplus
}
#endif

#endif /* JDA_TPU_NATIVE_H */
