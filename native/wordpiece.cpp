// Native WordPiece tokenizer: the host-side preprocessing tier.
//
// The encode pipeline is device-bound at ~2.7k passages/s/chip while the
// pure-Python tokenizer peaks at ~0.7k passages/s/core — tokenization is the
// host bottleneck the moment one chip is fed, and the reference's equivalent
// layer (TextEncodeBase encoders, reference: tokenizer_utils.jl:82-100) is
// likewise native (Julia-compiled). This C++ implementation handles the
// ASCII fast path with exact parity to the Python tokenizer
// (colbert_tpu/tokenization/wordpiece.py); texts containing non-ASCII bytes
// are flagged so the caller can fall back to the Python path (full Unicode
// normalization) for those texts only.
//
// C ABI (ctypes-friendly):
//   wp_create(vocab_blob, n_tokens, unk_id, max_chars) -> handle
//     vocab_blob: '\n'-joined token strings, id = position.
//   wp_encode_batch(handle, texts_blob, text_offsets, n_texts, do_lower,
//                   out_ids, out_lens, max_tokens_per_text, n_threads)
//     texts_blob: concatenated UTF-8 texts; text i spans
//       [text_offsets[i], text_offsets[i+1]).
//     out_ids: int32[n_texts * max_tokens_per_text]; out_lens: int32[n_texts],
//       where -1 marks "contains non-ASCII: use the Python fallback" and
//       -2 marks "more than max_tokens_per_text tokens: Python fallback"
//       (the native path never silently truncates).
//   wp_destroy(handle)

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> map;
    int32_t unk_id = 0;
    int32_t max_chars = 100;
};

inline bool is_ascii_punct(unsigned char c) {
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
           (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

inline bool is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

// DEL (0x7F) is a control char for the HF BasicTokenizer too — it must be
// stripped, not kept inside a word (parity with wordpiece.py `_is_control`).
inline bool is_ctrl(unsigned char c) {
    return (c < 32 && !is_ws(c)) || c == 127;
}

// Greedy longest-match WordPiece over one ASCII word; returns false if the
// word cannot be fully pieced (caller emits UNK).
bool wordpiece(const Vocab& v, std::string_view word, std::vector<int32_t>& out) {
    size_t start = 0;
    std::string buf;
    size_t emitted_before = out.size();
    while (start < word.size()) {
        size_t end = word.size();
        int32_t match = -1;
        size_t match_end = 0;
        while (start < end) {
            buf.assign(start > 0 ? "##" : "");
            buf.append(word.substr(start, end - start));
            auto it = v.map.find(buf);
            if (it != v.map.end()) {
                match = it->second;
                match_end = end;
                break;
            }
            --end;
        }
        if (match < 0) {
            out.resize(emitted_before);
            return false;
        }
        out.push_back(match);
        start = match_end;
    }
    return true;
}

void encode_one(const Vocab& v, std::string_view text, bool do_lower,
                std::vector<int32_t>& out) {
    std::string word;
    auto flush_word = [&]() {
        if (word.empty()) return;
        if ((int32_t)word.size() > v.max_chars) {
            out.push_back(v.unk_id);
        } else if (!wordpiece(v, word, out)) {
            out.push_back(v.unk_id);
        }
        word.clear();
    };
    for (unsigned char c : text) {
        if (c == 0 || is_ctrl(c)) continue;
        if (is_ws(c)) {
            flush_word();
        } else if (is_ascii_punct(c)) {
            flush_word();
            std::string p(1, (char)c);
            auto it = v.map.find(p);
            out.push_back(it != v.map.end() ? it->second : v.unk_id);
        } else {
            word.push_back(do_lower ? (char)tolower(c) : (char)c);
        }
    }
    flush_word();
}

bool all_ascii(std::string_view s) {
    for (unsigned char c : s)
        if (c >= 128) return false;
    return true;
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_blob, int32_t n_tokens, int32_t unk_id,
                int32_t max_chars) {
    auto* v = new Vocab();
    v->unk_id = unk_id;
    v->max_chars = max_chars;
    const char* p = vocab_blob;
    for (int32_t i = 0; i < n_tokens; ++i) {
        const char* nl = strchr(p, '\n');
        size_t len = nl ? (size_t)(nl - p) : strlen(p);
        v->map.emplace(std::string(p, len), i);
        if (!nl) break;
        p = nl + 1;
    }
    return v;
}

void wp_encode_batch(void* handle, const char* texts_blob,
                     const int64_t* text_offsets, int32_t n_texts,
                     int32_t do_lower, int32_t* out_ids, int32_t* out_lens,
                     int32_t max_tokens_per_text, int32_t n_threads) {
    const Vocab& v = *static_cast<Vocab*>(handle);
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int32_t lo, int32_t hi) {
        std::vector<int32_t> ids;
        for (int32_t i = lo; i < hi; ++i) {
            std::string_view text(texts_blob + text_offsets[i],
                                  (size_t)(text_offsets[i + 1] - text_offsets[i]));
            if (!all_ascii(text)) {
                out_lens[i] = -1;  // python fallback
                continue;
            }
            ids.clear();
            encode_one(v, text, do_lower != 0, ids);
            int32_t n = (int32_t)ids.size();
            if (n > max_tokens_per_text) {
                out_lens[i] = -2;  // overflow: python fallback (never truncate)
                continue;
            }
            memcpy(out_ids + (int64_t)i * max_tokens_per_text, ids.data(),
                   (size_t)n * sizeof(int32_t));
            out_lens[i] = n;
        }
    };
    if (n_threads == 1 || n_texts < 64) {
        work(0, n_texts);
        return;
    }
    std::vector<std::thread> threads;
    int32_t per = (n_texts + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        int32_t lo = t * per, hi = std::min(n_texts, lo + per);
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

}  // extern "C"
