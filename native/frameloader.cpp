// Native video frame loader (the TPU-host replacement for the reference's
// decord dependency, /root/reference/VideoGLaMM/chat.py:15,80).
//
// FFmpeg-based demux + decode + swscale resize to packed RGB24, exposed as a
// C ABI consumed via ctypes (videoglamm_tpu/data/video_reader.py). Decoding
// is sequential-with-seek: an ascending index list is satisfied in one pass
// (the access pattern of uniform frame sampling), with a keyframe seek when
// the gap is large. Also includes a test-video writer so the loader is
// testable in hermetic environments without an ffmpeg CLI.
//
// Build: g++ -O2 -shared -fPIC frameloader.cpp -o libvglframes.so \
//        -lavformat -lavcodec -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct VglVideo {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;
  double fps = 0.0;
  int width = 0;
  int height = 0;
  // decode cursor: index of the next frame the decoder will output
  int64_t cursor = 0;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
};

int open_decoder(VglVideo* v) {
  const AVCodec* codec =
      avcodec_find_decoder(v->fmt->streams[v->stream_index]->codecpar->codec_id);
  if (!codec) return -1;
  v->dec = avcodec_alloc_context3(codec);
  if (!v->dec) return -1;
  if (avcodec_parameters_to_context(
          v->dec, v->fmt->streams[v->stream_index]->codecpar) < 0)
    return -1;
  v->dec->thread_count = 0;  // auto
  if (avcodec_open2(v->dec, codec, nullptr) < 0) return -1;
  return 0;
}

// decode until the next output frame; returns 0 on success, <0 on EOF/error
int next_frame(VglVideo* v) {
  while (true) {
    int ret = avcodec_receive_frame(v->dec, v->frame);
    if (ret == 0) return 0;
    if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return ret;
    if (ret == AVERROR_EOF) return ret;
    // feed more packets
    while (true) {
      ret = av_read_frame(v->fmt, v->pkt);
      if (ret < 0) {
        avcodec_send_packet(v->dec, nullptr);  // flush
        break;
      }
      if (v->pkt->stream_index == v->stream_index) {
        avcodec_send_packet(v->dec, v->pkt);
        av_packet_unref(v->pkt);
        break;
      }
      av_packet_unref(v->pkt);
    }
  }
}

int64_t count_frames(VglVideo* v) {
  AVStream* st = v->fmt->streams[v->stream_index];
  if (st->nb_frames > 0) return st->nb_frames;
  // demux-count fallback (container without frame count metadata)
  int64_t n = 0;
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(v->fmt, pkt) >= 0) {
    if (pkt->stream_index == v->stream_index) n++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_seek_frame(v->fmt, v->stream_index, 0,
                AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_FRAME);
  return n;
}

}  // namespace

extern "C" {

VglVideo* vgl_open(const char* path) {
  auto* v = new VglVideo();
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  v->stream_index =
      av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (v->stream_index < 0 || open_decoder(v) < 0) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  AVStream* st = v->fmt->streams[v->stream_index];
  v->width = v->dec->width;
  v->height = v->dec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  v->fps = fr.den ? av_q2d(fr) : 0.0;
  v->num_frames = count_frames(v);
  v->pkt = av_packet_alloc();
  v->frame = av_frame_alloc();
  v->cursor = 0;
  return v;
}

void vgl_close(VglVideo* v) {
  if (!v) return;
  if (v->frame) av_frame_free(&v->frame);
  if (v->pkt) av_packet_free(&v->pkt);
  if (v->dec) avcodec_free_context(&v->dec);
  if (v->fmt) avformat_close_input(&v->fmt);
  delete v;
}

long vgl_num_frames(VglVideo* v) { return (long)v->num_frames; }
double vgl_fps(VglVideo* v) { return v->fps; }
int vgl_width(VglVideo* v) { return v->width; }
int vgl_height(VglVideo* v) { return v->height; }

// Read frames at ascending `indices` (n of them), resized to out_w x out_h
// RGB24 into `out` ([n, out_h, out_w, 3], C-contiguous).
// Returns number of frames written (== n on success).
int vgl_read_frames(VglVideo* v, const long* indices, int n, uint8_t* out,
                    int out_w, int out_h) {
  if (!v || n <= 0) return 0;
  // restart from the beginning when indices rewind
  if (indices[0] < v->cursor) {
    av_seek_frame(v->fmt, v->stream_index, 0,
                  AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_FRAME);
    avcodec_flush_buffers(v->dec);
    v->cursor = 0;
  }
  SwsContext* sws =
      sws_getContext(v->width, v->height, v->dec->pix_fmt, out_w, out_h,
                     AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return 0;

  int written = 0;
  const int out_stride = out_w * 3;
  for (int i = 0; i < n; i++) {
    const int64_t want = indices[i];
    // duplicate index: re-emit the last decoded frame
    if (i > 0 && want == indices[i - 1]) {
      std::memcpy(out + (size_t)written * out_h * out_stride,
                  out + (size_t)(written - 1) * out_h * out_stride,
                  (size_t)out_h * out_stride);
      written++;
      continue;
    }
    int rc = 0;
    while (v->cursor <= want) {
      rc = next_frame(v);
      if (rc < 0) break;
      v->cursor++;
    }
    if (rc < 0) break;
    uint8_t* dst[1] = {out + (size_t)written * out_h * out_stride};
    int dst_stride[1] = {out_stride};
    sws_scale(sws, v->frame->data, v->frame->linesize, 0, v->height, dst,
              dst_stride);
    written++;
  }
  sws_freeContext(sws);
  return written;
}

// Write a synthetic test video (mpeg4 in .avi) so the loader is testable
// without an ffmpeg CLI. Each frame f is a flat color (f, 2f, 3f) mod 256
// plus a moving white square, making frame identity checkable after decode.
int vgl_write_test_video(const char* path, int w, int h, int n_frames,
                         int fps) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return -1;
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->time_base = {1, fps};
  enc->framerate = {fps, 1};
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  enc->gop_size = 8;
  enc->bit_rate = 2000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* rgb = av_frame_alloc();
  rgb->format = AV_PIX_FMT_RGB24;
  rgb->width = w;
  rgb->height = h;
  av_frame_get_buffer(rgb, 0);
  AVFrame* yuv = av_frame_alloc();
  yuv->format = AV_PIX_FMT_YUV420P;
  yuv->width = w;
  yuv->height = h;
  av_frame_get_buffer(yuv, 0);
  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) {
    avcodec_send_frame(enc, f);
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int f = 0; f < n_frames; f++) {
    av_frame_make_writable(rgb);
    for (int y = 0; y < h; y++) {
      uint8_t* row = rgb->data[0] + y * rgb->linesize[0];
      for (int x = 0; x < w; x++) {
        row[3 * x + 0] = (uint8_t)((f * 23 + 40) & 0xFF);
        row[3 * x + 1] = (uint8_t)((f * 47 + 80) & 0xFF);
        row[3 * x + 2] = (uint8_t)((f * 71 + 120) & 0xFF);
      }
    }
    // moving 8x8 white square
    int sx = (f * 4) % (w - 8), sy = (f * 2) % (h - 8);
    for (int y = sy; y < sy + 8; y++) {
      uint8_t* row = rgb->data[0] + y * rgb->linesize[0];
      for (int x = sx; x < sx + 8; x++)
        row[3 * x] = row[3 * x + 1] = row[3 * x + 2] = 255;
    }
    sws_scale(sws, rgb->data, rgb->linesize, 0, h, yuv->data, yuv->linesize);
    yuv->pts = f;
    flush(yuv);
  }
  flush(nullptr);
  av_write_trailer(fmt);

  av_packet_free(&pkt);
  sws_freeContext(sws);
  av_frame_free(&rgb);
  av_frame_free(&yuv);
  avcodec_free_context(&enc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
