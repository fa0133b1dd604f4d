/* Standalone C consumer of the tuatara C ABI — the equivalent of the
 * reference's examples/resume.cpp (image -> image_to_data -> print), but
 * linking a plain C library instead of LibTorch+OpenCV.
 *
 * Build & run (PYTHONPATH must reach the tuatara_tpu package):
 *   make capi_example
 *   PYTHONPATH=../ ./capi_example            # synthetic image, random weights
 *   PYTHONPATH=../ ./capi_example <weights_dir>   # like resume.cpp argv
 */

#include <stdio.h>
#include <stdlib.h>

#include "tuatara_capi.h"

int main(int argc, char** argv) {
  const char* weights_dir = argc > 1 ? argv[1] : NULL;
  const int h = 96, w = 120, c = 3;
  unsigned char* img = (unsigned char*)malloc((size_t)h * w * c);
  /* white page with two dark bars — gives a random-weight detector texture */
  for (int i = 0; i < h * w * c; ++i) img[i] = 255;
  for (int y = 20; y < 30; ++y)
    for (int x = 10; x < 60; ++x)
      for (int k = 0; k < c; ++k) img[(y * w + x) * c + k] = 10;
  for (int y = 50; y < 58; ++y)
    for (int x = 30; x < 90; ++x)
      for (int k = 0; k < c; ++k) img[(y * w + x) * c + k] = 10;

  TuataraItem items[64];
  int n = tuatara_image_to_data(img, h, w, c, weights_dir, NULL, items, 64);
  if (n < 0) {
    fprintf(stderr, "error: %s\n", tuatara_last_error());
    free(img);
    return 1;
  }
  printf("%d items\n", n);
  for (int i = 0; i < n; ++i) {
    printf("  text=%-12s bbox=[%.0f %.0f %.0f %.0f] conf=%.3g\n",
           items[i].text, items[i].bbox[0], items[i].bbox[1], items[i].bbox[2],
           items[i].bbox[3], items[i].confidence);
  }
  free(img);
  return 0;
}
