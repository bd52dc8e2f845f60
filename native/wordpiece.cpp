// Native WordPiece tokenizer (BERT-compatible), C ABI for ctypes.
//
// Replaces the HF tokenizer dependency on the hot host path: vocab.txt in,
// [CLS] wordpiece... [SEP] + padding out. Semantics mirror
// mdhs_tpu/data/tokenizer.py (HF BasicTokenizer + WordPiece): lowercasing,
// ASCII punctuation splitting, UTF-8-aware CJK isolation, greedy
// longest-match-first subwords with "##" continuations.
//
// Build: see native/Makefile.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int> vocab;
  int pad_id = 0, unk_id = 1, cls_id = 2, sep_id = 3;
  bool lowercase = true;
  int max_chars_per_word = 100;
};

static bool is_punct(unsigned char ch) {
  return std::ispunct(ch) != 0;
}

// Decode one UTF-8 codepoint; returns bytes consumed.
static int utf8_next(const char* s, size_t len, uint32_t* cp) {
  unsigned char c = static_cast<unsigned char>(s[0]);
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && len >= 2) {
    *cp = ((c & 0x1F) << 6) | (s[1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && len >= 3) {
    *cp = ((c & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && len >= 4) {
    *cp = ((c & 0x07) << 18) | ((s[1] & 0x3F) << 12) | ((s[2] & 0x3F) << 6) |
          (s[3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

static bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0xF900 && cp <= 0xFAFF);
}

// Basic tokenization: whitespace split, CJK isolation, punct split, lowercase.
static std::vector<std::string> basic_tokenize(const Tokenizer& t,
                                               const char* text) {
  std::vector<std::string> words;
  std::string cur;
  auto flush = [&]() {
    if (!cur.empty()) {
      words.push_back(cur);
      cur.clear();
    }
  };
  size_t len = std::strlen(text);
  size_t i = 0;
  while (i < len) {
    uint32_t cp;
    int n = utf8_next(text + i, len - i, &cp);
    if (cp < 0x80) {
      unsigned char c = static_cast<unsigned char>(cp);
      if (std::isspace(c)) {
        flush();
      } else if (is_punct(c)) {
        flush();
        words.push_back(std::string(1, static_cast<char>(c)));
      } else {
        cur.push_back(t.lowercase ? static_cast<char>(std::tolower(c))
                                  : static_cast<char>(c));
      }
    } else if (is_cjk(cp)) {
      flush();
      words.push_back(std::string(text + i, n));
    } else {
      cur.append(text + i, n);
    }
    i += n;
  }
  flush();
  return words;
}

static void wordpiece(const Tokenizer& t, const std::string& word,
                      std::vector<int>* out) {
  if (static_cast<int>(word.size()) > t.max_chars_per_word) {
    out->push_back(t.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int> ids;
  while (start < word.size()) {
    size_t end = word.size();
    int cur = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = t.vocab.find(sub);
      if (it != t.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out->push_back(t.unk_id);
      return;
    }
    ids.push_back(cur);
    start = end;
  }
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, int lowercase) {
  auto* t = new Tokenizer();
  t->lowercase = lowercase != 0;
  std::ifstream f(vocab_path);
  if (!f.good()) {
    delete t;
    return nullptr;
  }
  std::string line;
  int idx = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    t->vocab.emplace(line, idx++);
  }
  auto get = [&](const char* k, int dflt) {
    auto it = t->vocab.find(k);
    return it == t->vocab.end() ? dflt : it->second;
  };
  t->pad_id = get("[PAD]", 0);
  t->unk_id = get("[UNK]", 1);
  t->cls_id = get("[CLS]", 2);
  t->sep_id = get("[SEP]", 3);
  return t;
}

int wp_vocab_size(void* handle) {
  return static_cast<int>(static_cast<Tokenizer*>(handle)->vocab.size());
}

void wp_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode into out_ids/out_mask (length max_len). Returns real token count.
int wp_encode(void* handle, const char* text, int max_len, int* out_ids,
              int* out_mask) {
  const Tokenizer& t = *static_cast<Tokenizer*>(handle);
  std::vector<int> ids;
  ids.push_back(t.cls_id);
  for (const auto& w : basic_tokenize(t, text)) {
    wordpiece(t, w, &ids);
    if (static_cast<int>(ids.size()) >= max_len - 1) break;
  }
  if (static_cast<int>(ids.size()) > max_len - 1) ids.resize(max_len - 1);
  ids.push_back(t.sep_id);
  int n = static_cast<int>(ids.size());
  for (int i = 0; i < max_len; ++i) {
    out_ids[i] = i < n ? ids[i] : t.pad_id;
    out_mask[i] = i < n ? 1 : 0;
  }
  return n;
}

}  // extern "C"
