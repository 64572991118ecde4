// Fast MIDI parsing + pianoroll quantization (native counterpart of
// multinn_tpu/data/midi.py + pianoroll.py hot loops; SURVEY C1/C2).
//
// The reference is pure Python end to end; this framework keeps a pure-Python
// MIDI layer as the portable reference implementation and adds this C++ fast
// path for corpus-scale ingest (Lakh: ~10^5 files [B:11]) — same semantics,
// verified bit-exact against the Python layer by tests/test_native.py.
//
// C ABI only (consumed via ctypes — no pybind11 on this image).
//
// Build: make -C native   (or cmake; see native/Makefile)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct MidiNote {
  int32_t start_tick;
  int32_t end_tick;
  uint8_t pitch;
  uint8_t velocity;
  uint8_t program;
  uint8_t is_drum;
};

struct ParseResult {
  MidiNote* notes;
  int64_t n_notes;
  int32_t ticks_per_quarter;
  int32_t tempo_us_per_quarter;
};

}  // extern "C"

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint8_t u8() {
    if (p >= end) { ok = false; return 0; }
    return *p++;
  }
  uint32_t be32() {
    uint32_t v = 0;
    for (int i = 0; i < 4; ++i) v = (v << 8) | u8();
    return v;
  }
  uint16_t be16() {
    uint16_t v = 0;
    for (int i = 0; i < 2; ++i) v = (uint16_t)((v << 8) | u8());
    return v;
  }
  uint32_t varint() {
    uint32_t v = 0;
    for (int i = 0; i < 4; ++i) {
      uint8_t b = u8();
      v = (v << 7) | (b & 0x7F);
      if (!(b & 0x80)) break;
    }
    return v;
  }
  void skip(uint32_t n) {
    if (p + n > end) { ok = false; p = end; } else { p += n; }
  }
  // clamp-to-end without error: the Python layer slices meta/sysex payloads
  // (a short slice is silently tolerated), so payload truncation must not
  // reject the file — only truncation inside EVENT bytes does
  void skip_clamp(uint32_t n) {
    p = (p + n > end) ? end : p + n;
  }
};

struct OpenNote {
  int32_t start;
  uint8_t velocity;
  uint8_t program;   // resolved at note-ON (a later program change on the
                     // channel must not re-attribute a sounding note —
                     // matches the Python reader)
};

// per (channel, pitch) stack of open notes
struct TrackState {
  std::vector<OpenNote> open[16][128];
  uint8_t program[16] = {0};
};

}  // namespace

extern "C" {

// Parse SMF bytes. Returns 0 on success. Caller must call midi_free_result.
int midi_parse(const uint8_t* data, int64_t len, ParseResult* out) {
  out->notes = nullptr;
  out->n_notes = 0;
  out->ticks_per_quarter = 480;
  out->tempo_us_per_quarter = 500000;
  if (len < 14 || std::memcmp(data, "MThd", 4) != 0) return 1;

  Cursor c{data + 4, data + len};
  uint32_t header_len = c.be32();
  (void)c.be16();                      // format
  uint16_t ntrks = c.be16();
  uint16_t division = c.be16();
  if (!c.ok || (division & 0x8000)) return 2;   // SMPTE unsupported
  out->ticks_per_quarter = division ? division : 480;
  c.p = data + 8 + header_len;

  std::vector<MidiNote> notes;
  notes.reserve(1024);
  // headline tempo = the EARLIEST tempo event by tick across all tracks
  // (ties keep track-parse order) — matches data/midi.py's post-sort rule
  int32_t tempo_tick = INT32_MAX;

  for (int t = 0; t < ntrks && c.p + 8 <= c.end; ) {
    if (std::memcmp(c.p, "MTrk", 4) != 0) {
      Cursor peek{c.p + 4, c.end};
      uint32_t alien = peek.be32();
      c.skip(8 + alien);
      continue;
    }
    c.p += 4;
    uint32_t chunk_len = c.be32();
    const uint8_t* chunk_end = c.p + chunk_len;
    if (chunk_end > c.end) chunk_end = c.end;

    TrackState st;
    int32_t tick = 0;
    int running = -1;
    Cursor tc{c.p, chunk_end};
    while (tc.p < tc.end && tc.ok) {
      tick += (int32_t)tc.varint();
      if (tc.p >= tc.end) {                 // delta with no event: truncated
        tc.ok = false;
        break;
      }
      uint8_t status = *tc.p;
      if (status >= 0x80) {
        tc.p++;
        if (status < 0xF0) running = status;
      } else {
        if (running < 0) { tc.ok = false; break; }
        status = (uint8_t)running;
      }
      if (status == 0xFF) {                       // meta
        uint8_t type = tc.u8();
        uint32_t mlen = tc.varint();
        if (type == 0x51 && mlen == 3 && tc.p + 3 <= tc.end &&
            tick < tempo_tick) {
          int32_t us = (tc.p[0] << 16) | (tc.p[1] << 8) | tc.p[2];
          out->tempo_us_per_quarter = us;
          tempo_tick = tick;
        }
        tc.skip_clamp(mlen);
      } else if (status == 0xF0 || status == 0xF7) {   // sysex
        tc.skip_clamp(tc.varint());
      } else if ((status & 0xF0) == 0xF0) {
        // 0xF1-0xF6 / 0xF8-0xFE: system common/realtime bytes never belong
        // in an SMF track — corruption; reject like the Python layer
        tc.ok = false;
        break;
      } else {
        uint8_t kind = status & 0xF0;
        uint8_t ch = status & 0x0F;
        uint8_t d1 = tc.u8();
        uint8_t d2 = 0;
        if (kind != 0xC0 && kind != 0xD0) d2 = tc.u8();
        if ((d1 | d2) & 0x80) {
          // a status byte where a data byte belongs: malformed event
          // (reject like the Python layer — masking fabricates notes)
          tc.ok = false;
          break;
        }
        if (kind == 0xC0) {
          st.program[ch] = d1;
        } else if (kind == 0x90 && d2 > 0) {
          st.open[ch][d1].push_back({tick, d2, st.program[ch]});
        } else if (kind == 0x80 || (kind == 0x90 && d2 == 0)) {
          auto& stack = st.open[ch][d1];
          if (!stack.empty()) {
            OpenNote on = stack.front();
            stack.erase(stack.begin());
            if (tick > on.start) {
              notes.push_back({on.start, tick, d1,
                               on.velocity, on.program,
                               (uint8_t)(ch == 9 ? 1 : 0)});
            }
          }
        }
      }
    }
    // close dangling notes defensively (matches the Python layer)
    // A track that died mid-event is a malformed file: fail loudly (rc=3)
    // like the Python layer's IndexError -> the caller skips the FILE, so
    // native and Python ingest build identical corpora for corrupt inputs.
    if (!tc.ok) return 3;

    for (int ch = 0; ch < 16; ++ch)
      for (int pp = 0; pp < 128; ++pp)
        for (auto& on : st.open[ch][pp])
          notes.push_back({on.start, on.start + 1, (uint8_t)pp, on.velocity,
                           on.program, (uint8_t)(ch == 9 ? 1 : 0)});

    c.p = chunk_end;
    ++t;
  }

  out->n_notes = (int64_t)notes.size();
  if (!notes.empty()) {
    out->notes = (MidiNote*)std::malloc(notes.size() * sizeof(MidiNote));
    std::memcpy(out->notes, notes.data(), notes.size() * sizeof(MidiNote));
  }
  return 0;
}

void midi_free_result(ParseResult* r) {
  std::free(r->notes);
  r->notes = nullptr;
  r->n_notes = 0;
}

// LPD-5 program-range mapping (must match pianoroll.lpd5_track_index)
static inline int lpd5_track(uint8_t program, uint8_t is_drum) {
  if (is_drum) return 0;
  if (program <= 7) return 1;
  if (program >= 24 && program <= 31) return 2;
  if (program >= 32 && program <= 39) return 3;
  return 4;
}

// Quantize notes onto a binary (n_steps, n_tracks, n_pitches) uint8 roll.
// Rounding semantics identical to pianoroll.midi_to_roll.
int notes_to_roll(const MidiNote* notes, int64_t n_notes,
                  double ticks_per_step, int32_t n_steps, int32_t n_tracks,
                  int32_t pitch_min, int32_t pitch_max, uint8_t* roll) {
  const int32_t d = pitch_max - pitch_min + 1;
  const int64_t track_stride = d;
  const int64_t step_stride = (int64_t)n_tracks * d;
  for (int64_t i = 0; i < n_notes; ++i) {
    const MidiNote& n = notes[i];
    if (n.pitch < pitch_min || n.pitch > pitch_max) continue;
    int k = (n_tracks == 5) ? lpd5_track(n.program, n.is_drum) : 0;
    if (k >= n_tracks) k = n_tracks - 1;
    // Python round() is banker's rounding (half to even) — match it exactly
    // so rolls are bit-identical with the pure-Python layer:
    auto py_round = [](double x) -> int64_t {
      double f = x - std::floor(x) - 0.5;
      int64_t lo = (int64_t)std::floor(x);
      if (f > 0) return lo + 1;
      if (f < 0) return lo;
      return (lo % 2 == 0) ? lo : lo + 1;   // half to even
    };
    int64_t s = py_round((double)n.start_tick / ticks_per_step);
    int64_t e = py_round((double)n.end_tick / ticks_per_step);
    if (e <= s) e = s + 1;
    if (s > n_steps - 1) s = n_steps - 1;
    if (e > n_steps) e = n_steps;
    for (int64_t t = s; t < e; ++t)
      roll[t * step_stride + k * track_stride + (n.pitch - pitch_min)] = 1;
  }
  return 0;
}

int64_t roll_end_tick(const MidiNote* notes, int64_t n_notes) {
  int64_t m = 0;
  for (int64_t i = 0; i < n_notes; ++i)
    if (notes[i].end_tick > m) m = notes[i].end_tick;
  return m;
}

}  // extern "C"
