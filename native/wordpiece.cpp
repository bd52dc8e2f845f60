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
  int n_ids = 0;  // max assigned id + 1 (= line count; != vocab.size() on dup lines)
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

// HF BasicTokenizer._clean_text: NUL / U+FFFD / control+format chars removed.
static bool is_removed_control(uint32_t cp) {
  if (cp == 0 || cp == 0xFFFD) return true;
  if (cp < 0x20 && cp != '\t' && cp != '\n' && cp != '\r') return true;
  if (cp == 0x7F || cp == 0xAD) return true;  // DEL, soft hyphen (Cf)
  if ((cp >= 0x200B && cp <= 0x200F) || (cp >= 0x202A && cp <= 0x202E) ||
      cp == 0x2060 || cp == 0xFEFF)
    return true;
  return false;
}

static bool is_uspace(uint32_t cp) {
  return cp == 0xA0 || cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) ||
         cp == 0x2028 || cp == 0x2029 || cp == 0x202F || cp == 0x205F ||
         cp == 0x3000;
}

// Unicode category-P approximation for the BMP ranges that occur in text.
static bool is_upunct(uint32_t cp) {
  if (cp == 0xA1 || cp == 0xA7 || cp == 0xAB || cp == 0xB6 || cp == 0xB7 ||
      cp == 0xBB || cp == 0xBF)
    return true;
  if ((cp >= 0x2010 && cp <= 0x2027) || (cp >= 0x2030 && cp <= 0x205E))
    return !is_uspace(cp);
  if (cp >= 0x3001 && cp <= 0x303F) return true;  // CJK punctuation
  if ((cp >= 0xFF01 && cp <= 0xFF0F) || (cp >= 0xFF1A && cp <= 0xFF20) ||
      (cp >= 0xFF3B && cp <= 0xFF40) || (cp >= 0xFF5B && cp <= 0xFF65))
    return true;  // fullwidth forms
  return false;
}

// Accent stripping (HF _run_strip_accents: NFD then drop Mn) for the Latin
// repertoire, fused with lowercasing. Returns the base ASCII letter, 1 to
// drop (combining mark), or 0 to keep the codepoint (lowercased by caller).
static char latin_base(uint32_t cp) {
  if (cp >= 0x300 && cp <= 0x36F) return 1;  // combining marks: drop
  // Latin-1 Supplement: 0 marks non-decomposables (æ ð ø þ ß × ÷ kept)
  static const char kL1[0x40] = {
      // C0-CF
      'a', 'a', 'a', 'a', 'a', 'a', 0, 'c', 'e', 'e', 'e', 'e', 'i', 'i', 'i', 'i',
      // D0-DF
      0, 'n', 'o', 'o', 'o', 'o', 'o', 0, 0, 'u', 'u', 'u', 'u', 'y', 0, 0,
      // E0-EF
      'a', 'a', 'a', 'a', 'a', 'a', 0, 'c', 'e', 'e', 'e', 'e', 'i', 'i', 'i', 'i',
      // F0-FF
      0, 'n', 'o', 'o', 'o', 'o', 'o', 0, 0, 'u', 'u', 'u', 'u', 'y', 0, 'y'};
  if (cp >= 0xC0 && cp <= 0xFF) return kL1[cp - 0xC0];
  // Latin Extended-A; 0 = no canonical decomposition (đ ħ ı ĳ ł ŋ œ ŧ ſ ...)
  static const char kExtA[0x80] = {
      'a', 'a', 'a', 'a', 'a', 'a', 'c', 'c', 'c', 'c', 'c', 'c', 'c', 'c',
      'd', 'd', 0, 0,  // 010E-0111
      'e', 'e', 'e', 'e', 'e', 'e', 'e', 'e', 'e', 'e',  // 0112-011B
      'g', 'g', 'g', 'g', 'g', 'g', 'g', 'g', 'h', 'h', 0, 0,  // 011C-0127
      'i', 'i', 'i', 'i', 'i', 'i', 'i', 'i', 'i', 0, 0, 0,  // 0128-0133
      'j', 'j', 'k', 'k', 0,  // 0134-0138
      'l', 'l', 'l', 'l', 'l', 'l', 0, 0, 0, 0,  // 0139-0142
      'n', 'n', 'n', 'n', 'n', 'n', 0, 0, 0,  // 0143-014B
      'o', 'o', 'o', 'o', 'o', 'o', 0, 0,  // 014C-0153
      'r', 'r', 'r', 'r', 'r', 'r',  // 0154-0159
      's', 's', 's', 's', 's', 's', 's', 's',  // 015A-0161
      't', 't', 't', 't', 0, 0,  // 0162-0167
      'u', 'u', 'u', 'u', 'u', 'u', 'u', 'u', 'u', 'u', 'u', 'u',  // 0168-0173
      'w', 'w', 'y', 'y', 'y',  // 0174-0178
      'z', 'z', 'z', 'z', 'z', 'z', 0};  // 0179-017F
  if (cp >= 0x100 && cp <= 0x17F) return kExtA[cp - 0x100];
  return 0;
}

// Lowercase the kept non-ASCII Latin codepoints (HF lower()).
static uint32_t latin_lower(uint32_t cp) {
  if ((cp >= 0xC0 && cp <= 0xDE) && cp != 0xD7) return cp + 0x20;
  switch (cp) {  // Ext-A non-decomposables with odd-offset pairs
    case 0x110: case 0x126: case 0x132: case 0x13F: case 0x141:
    case 0x14A: case 0x152: case 0x166:
      return cp + 1;
    default:
      return cp;
  }
}

static void append_utf8(std::string* s, uint32_t cp) {
  if (cp < 0x80) {
    s->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    s->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    s->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    s->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    s->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    s->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    s->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    s->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Basic tokenization (HF BasicTokenizer): clean, CJK isolation, whitespace
// split, lowercase + accent strip, punct split.
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
    i += n;
    if (is_removed_control(cp)) continue;
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
      continue;
    }
    if (is_cjk(cp)) {
      flush();
      std::string w;
      append_utf8(&w, cp);
      words.push_back(w);
      continue;
    }
    if (is_uspace(cp)) {
      flush();
      continue;
    }
    if (is_upunct(cp)) {
      flush();
      std::string w;
      append_utf8(&w, cp);
      words.push_back(w);
      continue;
    }
    if (t.lowercase) {
      char base = latin_base(cp);
      if (base == 1) continue;  // combining mark stripped
      if (base) {
        cur.push_back(base);
        continue;
      }
      cp = latin_lower(cp);
    }
    append_utf8(&cur, cp);
  }
  flush();
  return words;
}

static void wordpiece(const Tokenizer& t, const std::string& word,
                      std::vector<int>* out) {
  // HF counts codepoints, not bytes, for the >100-char UNK rule
  int n_cp = 0;
  for (size_t j = 0; j < word.size(); ++j)
    if ((static_cast<unsigned char>(word[j]) & 0xC0) != 0x80) ++n_cp;
  if (n_cp > t.max_chars_per_word) {
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
    // operator[]: last duplicate wins, matching HF load_vocab and the
    // Python from_vocab_file (emplace would keep the FIRST id while idx
    // still advances, emitting ids the two implementations disagree on).
    t->vocab[line] = idx++;
  }
  t->n_ids = idx;
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
  // max id + 1, NOT map.size(): embedding tables are sized from this, and
  // duplicate vocab lines would otherwise let emitted ids reach vocab_size.
  return static_cast<Tokenizer*>(handle)->n_ids;
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
