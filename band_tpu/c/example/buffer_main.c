/* C client for the buffer + image-processor surface of the band-tpu C
 * API (role-equivalent to the reference's c_api_buffer usage, see
 * band/c/c_api_buffer.h): build buffers from raw RGB / NV21 / strided
 * I420 data, run automatic and explicit pipelines into a model input
 * tensor, and feed the result through one inference.
 *
 * Usage: buffer_main <add.tflite>   (input: 1x8x8x3 float32, y = 3*x)
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "band_c.h"

static int approx(float a, float b) { return a > b - 0.5f && a < b + 0.5f; }

static float first(BandTensor* t) {
  return ((const float*)BandTensorGetData(t))[0];
}

int main(int argc, char** argv) {
  setvbuf(stdout, NULL, _IONBF, 0);
  if (argc < 2) {
    fprintf(stderr, "usage: %s <add.tflite>\n", argv[0]);
    return 2;
  }

  BandConfigBuilder* cb = BandConfigBuilderCreate();
  if (BandAddConfigJson(
          cb,
          "{\"schedulers\": [\"fixed_worker\"],"
          " \"workers\": [{\"device\": \"cpu\", \"device_ids\": [0]}],"
          " \"profile_num_warmups\": 0, \"profile_num_runs\": 1}") !=
      kBandOk) {
    fprintf(stderr, "config error: %s\n", BandGetLastError());
    return 1;
  }
  BandConfig* config = BandConfigCreate(cb);
  BandConfigBuilderDelete(cb);
  BandEngine* engine = BandEngineCreate(config);
  BandModel* model = BandModelCreate();
  if (engine == NULL || BandModelAddFromFile(model, argv[1]) != kBandOk ||
      BandEngineRegisterModel(engine, model) != kBandOk) {
    fprintf(stderr, "setup failed: %s\n", BandGetLastError());
    return 1;
  }
  BandTensor* in0 = BandEngineCreateInputTensor(engine, model, 0);
  BandTensor* out0 = BandEngineCreateOutputTensor(engine, model, 0);
  if (in0 == NULL || out0 == NULL ||
      BandTensorGetType(in0) != kBandFloat32) {
    fprintf(stderr, "tensor setup failed: %s\n", BandGetLastError());
    return 1;
  }

  /* 16x16 RGB: left half 100, right half 200. */
  unsigned char rgb[16 * 16 * 3];
  for (int y = 0; y < 16; ++y)
    for (int x = 0; x < 16; ++x)
      for (int c = 0; c < 3; ++c)
        rgb[(y * 16 + x) * 3 + c] = (unsigned char)(x < 8 ? 100 : 200);
  BandBuffer* buf = BandBufferCreate();
  if (BandBufferSetFromRawData(buf, rgb, 16, 16, kBandRGB) != kBandOk) {
    fprintf(stderr, "set raw failed: %s\n", BandGetLastError());
    return 1;
  }

  /* 1) Empty builder: automatic resize 16->8 + dtype convert. */
  BandImageProcessorBuilder* b1 = BandImageProcessorBuilderCreate();
  BandImageProcessor* p1 = BandImageProcessorBuilderBuild(b1);
  if (BandImageProcessorProcess(p1, buf, in0) != kBandOk) {
    fprintf(stderr, "auto process failed: %s\n", BandGetLastError());
    return 1;
  }
  const float* in_data = (const float*)BandTensorGetData(in0);
  printf("auto left=%.1f right=%.1f ok=%d\n", in_data[0], in_data[7 * 3],
         approx(in_data[0], 100.0f) && approx(in_data[7 * 3], 200.0f));

  /* 2) Crop the right half + normalize: (200 - 100) / 2 = 50. */
  BandImageProcessorBuilder* b2 = BandImageProcessorBuilderCreate();
  if (BandAddOperator(b2, BAND_CROP, 4, 8, 0, 15, 7) != kBandOk ||
      BandAddOperator(b2, BAND_NORMALIZE, 2, 100.0, 2.0) != kBandOk) {
    fprintf(stderr, "add operator failed: %s\n", BandGetLastError());
    return 1;
  }
  BandImageProcessor* p2 = BandImageProcessorBuilderBuild(b2);
  if (BandImageProcessorProcess(p2, buf, in0) != kBandOk) {
    fprintf(stderr, "crop+norm failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("crop_norm=%.1f ok=%d\n", first(in0), approx(first(in0), 50.0f));

  /* 3) Flip / rotate on an 8x8 column gradient (value = 10 * x). */
  unsigned char grad[8 * 8 * 3];
  for (int y = 0; y < 8; ++y)
    for (int x = 0; x < 8; ++x)
      for (int c = 0; c < 3; ++c)
        grad[(y * 8 + x) * 3 + c] = (unsigned char)(10 * x);
  BandBufferSetFromRawData(buf, grad, 8, 8, kBandRGB);

  BandImageProcessorBuilder* b3 = BandImageProcessorBuilderCreate();
  BandAddOperator(b3, BAND_FLIP, 2, 1, 0);
  BandAddOperator(b3, BAND_DATA_TYPE_CONVERT, 0);
  BandImageProcessor* p3 = BandImageProcessorBuilderBuild(b3);
  if (BandImageProcessorProcess(p3, buf, in0) != kBandOk) {
    fprintf(stderr, "flip failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("flip=%.1f ok=%d\n", first(in0), approx(first(in0), 70.0f));

  BandImageProcessorBuilder* b4 = BandImageProcessorBuilderCreate();
  BandAddOperator(b4, BAND_ROTATE, 1, 90);
  BandAddOperator(b4, BAND_NORMALIZE, 2, 0.0, 1.0);
  BandImageProcessor* p4 = BandImageProcessorBuilderBuild(b4);
  if (BandImageProcessorProcess(p4, buf, in0) != kBandOk) {
    fprintf(stderr, "rotate failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("rotate=%.1f ok=%d\n", first(in0), approx(first(in0), 70.0f));

  /* 4) NV21 from a single blob: Y=128, VU=128 -> RGB 130 (BT.601). */
  unsigned char nv21[16 * 16 + 16 * 8];
  memset(nv21, 128, sizeof(nv21));
  if (BandBufferSetFromRawData(buf, nv21, 16, 16, kBandNV21) != kBandOk) {
    fprintf(stderr, "nv21 set failed: %s\n", BandGetLastError());
    return 1;
  }
  BandImageProcessor* p5 = BandImageProcessorBuilderBuild(b1);
  if (BandImageProcessorProcess(p5, buf, in0) != kBandOk) {
    fprintf(stderr, "nv21 process failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("nv21=%.1f ok=%d\n", first(in0), approx(first(in0), 130.0f));

  /* 5) Strided I420 planes via the YUV entry point (row padding). */
  unsigned char yp[20 * 16], up[12 * 8], vp[12 * 8];
  memset(yp, 128, sizeof(yp));
  memset(up, 128, sizeof(up));
  memset(vp, 128, sizeof(vp));
  if (BandBufferSetFromYUVData(buf, yp, up, vp, 16, 16, 20, 12, 1,
                               kBandYV21) != kBandOk) {
    fprintf(stderr, "yuv set failed: %s\n", BandGetLastError());
    return 1;
  }
  if (BandImageProcessorProcess(p5, buf, in0) != kBandOk) {
    fprintf(stderr, "yuv process failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("yuv=%.1f ok=%d\n", first(in0), approx(first(in0), 130.0f));

  /* 6) The processed tensor feeds inference: add.tflite gives 3*130. */
  BandTensor* ins[1] = {in0};
  BandTensor* outs[1] = {out0};
  if (BandEngineRequestSync(engine, model, ins, outs) != kBandOk) {
    fprintf(stderr, "request failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("sync=%.1f ok=%d\n", first(out0), approx(first(out0), 390.0f));

  /* error surface: wrong arity is rejected */
  BandImageProcessorBuilder* bad = BandImageProcessorBuilderCreate();
  printf("bad_arity=%d\n", BandAddOperator(bad, BAND_CROP, 2, 1, 2));
  BandImageProcessorBuilderDelete(bad);

  BandImageProcessorDelete(p1);
  BandImageProcessorDelete(p2);
  BandImageProcessorDelete(p3);
  BandImageProcessorDelete(p4);
  BandImageProcessorDelete(p5);
  BandImageProcessorBuilderDelete(b1);
  BandImageProcessorBuilderDelete(b2);
  BandImageProcessorBuilderDelete(b3);
  BandImageProcessorBuilderDelete(b4);
  BandBufferDelete(buf);
  BandTensorDelete(in0);
  BandTensorDelete(out0);
  BandModelDelete(model);
  BandEngineDelete(engine);
  BandConfigDelete(config);
  printf("BUFFER API OK\n");
  return 0;
}
