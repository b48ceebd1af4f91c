// Fixture generator for the reference-index IMPORT path.
//
// Produces a tiny index in the EXACT on-disk format of the reference
// C++ engine (scarburato/searchenginepp) by calling the reference's own
// serialization code — compiled against its headers, never copied:
//   - codes::disk_map_writer   (front-coded lexicon; diskmap/builder.hpp)
//   - codes::VariableBytes     (7-bit LE VarByte; variable_blocks.hpp)
//   - codes::UnaryEncoder      (LSB-first unary freqs; unary.hpp)
//   - sindex::LexiconValue / SigmaLexiconValue (index/types.hpp)
// File layout mirrors src/builder.cpp:98-111 (per-chunk db_N dirs),
// src/indexBuilder/IndexBuilder.cpp:22-112 (posting/doc-index streams),
// src/builder.cpp:127-181 (global lexicon + metadata).
//
// Build & run (the reference tree is read-only; -I only):
//   g++ -std=c++20 -O1 -I /root/reference/src \
//       tools/make_reference_fixture.cpp -o /tmp/make_ref_fixture
//   /tmp/make_ref_fixture tests/fixtures/ref_index
//
// The corpus is deterministic lowercase-ASCII text so the Python side
// can reproduce tokenization exactly (SIMPLE profile: whitespace split,
// no stemming). docids are 1-based global line numbers, split into two
// chunks (base 1 and 11) like the reference's 700MB chunk cuts.

#include <cstdint>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "index/types.hpp"
#include "codes/variable_blocks.hpp"
#include "codes/unary.hpp"
#include "codes/diskmap/diskmap.hpp"

namespace fs = std::filesystem;
using sindex::LexiconValue;
using sindex::SigmaLexiconValue;

struct Doc { std::string docno, text; };

// 18 docs, two chunks of 10 + 8; plain [a-z ] text only
static const std::vector<Doc> CORPUS = {
    {"d0001", "hash sort merge tree hash"},
    {"d0002", "sort sort tree"},
    {"d0003", "merge hash query"},
    {"d0004", "query engine index hash hash hash"},
    {"d0005", "tree index"},
    {"d0006", "engine engine sort"},
    {"d0007", "index query merge merge"},
    {"d0008", "hash tree sort query engine index merge"},
    {"d0009", "zebra"},
    {"d0010", "sort hash"},
    {"d0011", "query query query tree"},
    {"d0012", "engine hash"},
    {"d0013", "merge sort tree tree"},
    {"d0014", "index index engine"},
    {"d0015", "hash merge zebra zebra"},
    {"d0016", "tree query sort"},
    {"d0017", "engine index hash sort"},
    {"d0018", "zebra merge"},
    // latin1-domain terms: "caf\xe0" / "caf\xe9" (UTF-8 C3 A0 / C3 A9)
    // sort adjacent to "cafe", and compute_common_prefix counts BYTES,
    // so the front-coded suffix of "caf\xe9" after "caf\xe0" starts
    // MID-UTF-8-SEQUENCE — the importer must reassemble keys bytewise
    {"d0019", "cafe caf\xc3\xa0 caf\xc3\xa9 zebra"},
};
static const size_t CHUNK = 10;

struct Posting { std::vector<uint8_t> docids, freqs; size_t n_docs = 0; };

int main(int argc, char** argv)
{
    if (argc != 2) { std::cerr << "usage: " << argv[0] << " OUT_DIR\n"; return 2; }
    fs::path out(argv[1]);
    fs::create_directories(out);

    uint64_t doc_len_sum = 0;
    size_t n_chunks = (CORPUS.size() + CHUNK - 1) / CHUNK;

    // phase 1: per-chunk segments (builder.cpp:98-111 file set)
    for (size_t c = 0; c < n_chunks; ++c) {
        uint64_t base_docid = c * CHUNK + 1;
        size_t lo = c * CHUNK, hi = std::min(CORPUS.size(), lo + CHUNK);

        // term -> VarByte(absolute docid) stream + VarByte(tf) stream,
        // the in-memory shape IndexBuilder::add_to_post accumulates
        std::map<std::string, Posting> inv;
        std::vector<std::pair<std::string, uint64_t>> doc_index; // docno, len
        for (size_t i = lo; i < hi; ++i) {
            uint64_t docid = i + 1;
            std::map<std::string, uint64_t> tf;
            std::istringstream ss(CORPUS[i].text);
            std::string tok; uint64_t dl = 0;
            while (ss >> tok) { ++tf[tok]; ++dl; }
            doc_index.emplace_back(CORPUS[i].docno, dl);
            doc_len_sum += dl;
            for (auto& [term, f] : tf) {
                auto cd = codes::VariableBytes(docid);
                auto cf = codes::VariableBytes(f);
                auto& p = inv[term];
                p.docids.insert(p.docids.end(), cd.bytes, cd.bytes + cd.used_bytes);
                p.freqs.insert(p.freqs.end(), cf.bytes, cf.bytes + cf.used_bytes);
                p.n_docs += 1;
            }
        }

        fs::path seg = out / ("db_" + std::to_string(c));
        fs::create_directories(seg);
        std::ofstream f_doc(seg / "posting_lists_docids", std::ios::binary);
        std::ofstream f_frq(seg / "posting_lists_freqs", std::ios::binary);
        std::ofstream f_lex(seg / "lexicon_temp", std::ios::binary);
        std::ofstream f_slx(seg / "lexicon", std::ios::binary);
        std::ofstream f_din(seg / "document_index", std::ios::binary);

        // posting streams + byte ranges (IndexBuilder.cpp:28-71)
        std::map<std::string, LexiconValue> lex;
        for (auto& [term, p] : inv) {
            uint64_t s = f_doc.tellp();
            f_doc.write((const char*)p.docids.data(), p.docids.size());
            uint64_t e = f_doc.tellp();
            lex[term] = {s, e, 0, 0, p.n_docs};
        }
        for (auto& [term, p] : inv) {
            codes::VariableBlocksDecoder dec(p.freqs.begin(), p.freqs.end());
            codes::UnaryEncoder enc(dec.begin(), dec.end());
            uint64_t s = f_frq.tellp();
            for (uint8_t b : enc) f_frq.put(b);
            uint64_t e = f_frq.tellp();
            lex[term].start_pos_freq = s;
            lex[term].end_pos_freq = e;
        }

        // document index (IndexBuilder.cpp:74-98): header + fixed
        // records + NUL-joined docno heap
        f_din.write((const char*)&base_docid, sizeof(uint64_t));
        uint64_t nd = doc_index.size();
        f_din.write((const char*)&nd, sizeof(uint64_t));
        uint64_t off = 0;
        for (auto& [docno, dl] : doc_index) {
            sindex::DocumentInfoSerialized rec{off, dl};
            f_din.write((const char*)&rec, sizeof(rec));
            off += docno.size() + 1;
        }
        for (auto& [docno, dl] : doc_index)
            f_din.write(docno.c_str(), docno.size() + 1);

        // phase-1 lexicon (disk_map<LexiconValue>, fixed 5 values)
        codes::disk_map_writer<LexiconValue> w(f_lex);
        for (auto& [term, lv] : lex) w.add(term, lv);
        w.finalize();

        // phase-3 sigma lexicon (disk_map<SigmaLexiconValue>, N=0
        // count-prefixed): same byte ranges; sigma/skip content is
        // synthetic — the importer must IGNORE it (it recomputes), but
        // parsing must still walk the variable-length values correctly
        codes::disk_map_writer<SigmaLexiconValue> ws(f_slx);
        for (auto& [term, lv] : lex) {
            SigmaLexiconValue slv(lv);
            slv.bm25_sigma = 1.25; slv.tfidf_sigma = 2.5;
            SigmaLexiconValue::skip_pointer_t sp{};
            sp.bm25_ub = 1.25; sp.tfidf_ub = 2.5;
            sp.last_docid = base_docid; sp.docid_offset = 0; sp.freq_offset = 0;
            slv.skip_pointers.push_back(sp);
            ws.add(term, slv);
        }
        ws.finalize();
    }

    // global lexicon: df summed across chunks (builder.cpp:127-170);
    // disk_map<freq_t> (integral, one value per key)
    std::map<std::string, uint64_t> global_df;
    for (size_t i = 0; i < CORPUS.size(); ++i) {
        std::map<std::string, int> seen;
        std::istringstream ss(CORPUS[i].text);
        std::string tok;
        while (ss >> tok) seen[tok] = 1;
        for (auto& [t, _] : seen) global_df[t] += 1;
    }
    std::ofstream f_glx(out / "global_lexicon", std::ios::binary);
    codes::disk_map_writer<sindex::freq_t> wg(f_glx);
    for (auto& [t, df] : global_df) wg.add(t, df);
    wg.finalize();

    // metadata: 16 bytes (builder.cpp:177-181)
    std::ofstream f_meta(out / "metadata", std::ios::binary);
    uint64_t ndocs = CORPUS.size();
    f_meta.write((const char*)&doc_len_sum, sizeof(uint64_t));
    f_meta.write((const char*)&ndocs, sizeof(uint64_t));

    std::cout << "wrote reference-format fixture: " << out
              << " (docs=" << ndocs << ", doc_len_sum=" << doc_len_sum
              << ", terms=" << global_df.size() << ")\n";
    return 0;
}
