// Minimal RapidYAML-compatible API over a from-scratch YAML-subset parser.
//
// Purpose: build the SANA-FE reference offline (its CMake FetchContent
// needs network access for rapidyaml). Implements only the API surface the
// SANA-FE sources use: Tree/NodeRef/ConstNodeRef, parse_in_place/
// parse_in_arena, c4::yml::read type sniffing, ryml::key extraction,
// node locations, |= MAP/SEQ/FLOW_SL writing and stream emission.
//
// The parser covers the YAML subset in SANA-FE's description files: block
// maps/sequences, flow maps/sequences (possibly spanning lines), single/
// double-quoted and plain scalars, comments. No anchors, tags, multi-doc.
#ifndef RYML_SHIM_HPP_
#define RYML_SHIM_HPP_

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <ostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace c4 {

struct csubstr
{
    const char *str{nullptr};
    size_t len{0};
    csubstr() = default;
    csubstr(const char *s) : str(s), len(s != nullptr ? ::strlen(s) : 0) {}
    csubstr(const char *s, size_t l) : str(s), len(l) {}
    bool operator==(const csubstr &o) const
    {
        return len == o.len && (len == 0 || ::memcmp(str, o.str, len) == 0);
    }
    bool operator==(const char *o) const { return *this == csubstr(o); }
    bool operator!=(const csubstr &o) const { return !(*this == o); }
    bool operator!=(const char *o) const { return !(*this == o); }
    explicit operator std::string() const { return std::string(str, len); }
};

inline csubstr to_csubstr(const std::string &s)
{
    return {s.c_str(), s.size()};
}
inline csubstr to_csubstr(const char *s) { return {s}; }

} // namespace c4

namespace c4::yml {

constexpr size_t NPOS = static_cast<size_t>(-1);

using type_bits = uint64_t;
enum NodeType_e : type_bits
{
    NOTYPE = 0,
    VAL = 1U << 0U,
    KEY = 1U << 1U,
    MAP = 1U << 2U,
    SEQ = 1U << 3U,
    KEYVAL = KEY | VAL,
    KEYMAP = KEY | MAP,
    KEYSEQ = KEY | SEQ,
    FLOW_SL = 1U << 8U,
    BLOCK = 1U << 9U,
};

struct Location
{
    size_t offset{0};
    size_t line{0};
    size_t col{0};
};

struct NodeData
{
    type_bits flags{NOTYPE};
    bool has_key{false};
    bool has_val{false};
    std::string key;
    std::string val;
    size_t parent{NPOS};
    std::vector<size_t> children;
    size_t line{0};
    size_t col{0};
};

class Tree;
class Parser;
struct ConstNodeRef;
struct NodeRef;

// ---------------------------------------------------------------------------
// Scalar conversions (c4::yml::read equivalents). Sniffing semantics match
// rapidyaml/c4core closely enough for SANA-FE's files: ints are full-match
// decimal/hex integers, doubles full-match strtod, bools are 0/1/true/false
// (case-insensitive letters).
// ---------------------------------------------------------------------------

inline bool shim_read_scalar(const std::string &s, int *out)
{
    if (s.empty())
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const long v = ::strtol(s.c_str(), &end, 10);
    if (errno != 0 || end != s.c_str() + s.size())
    {
        return false;
    }
    if (v > 2147483647L || v < -2147483648L)
    {
        return false;
    }
    *out = static_cast<int>(v);
    return true;
}

inline bool shim_read_scalar(const std::string &s, long *out)
{
    if (s.empty())
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const long v = ::strtol(s.c_str(), &end, 10);
    if (errno != 0 || end != s.c_str() + s.size())
    {
        return false;
    }
    *out = v;
    return true;
}

inline bool shim_read_scalar(const std::string &s, long long *out)
{
    if (s.empty())
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const long long v = ::strtoll(s.c_str(), &end, 10);
    if (errno != 0 || end != s.c_str() + s.size())
    {
        return false;
    }
    *out = v;
    return true;
}

inline bool shim_read_scalar(const std::string &s, unsigned long *out)
{
    if (s.empty() || s[0] == '-')
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const unsigned long v = ::strtoul(s.c_str(), &end, 10);
    if (errno != 0 || end != s.c_str() + s.size())
    {
        return false;
    }
    *out = v;
    return true;
}

inline bool shim_read_scalar(const std::string &s, unsigned long long *out)
{
    if (s.empty() || s[0] == '-')
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const unsigned long long v = ::strtoull(s.c_str(), &end, 10);
    if (errno != 0 || end != s.c_str() + s.size())
    {
        return false;
    }
    *out = v;
    return true;
}

inline bool shim_read_scalar(const std::string &s, unsigned int *out)
{
    unsigned long v = 0;
    if (!shim_read_scalar(s, &v) || v > 4294967295UL)
    {
        return false;
    }
    *out = static_cast<unsigned int>(v);
    return true;
}

inline bool shim_read_scalar(const std::string &s, double *out)
{
    if (s.empty())
    {
        return false;
    }
    errno = 0;
    char *end = nullptr;
    const double v = ::strtod(s.c_str(), &end);
    if (end != s.c_str() + s.size())
    {
        return false;
    }
    *out = v;
    return true;
}

inline bool shim_read_scalar(const std::string &s, float *out)
{
    double v = 0.0;
    if (!shim_read_scalar(s, &v))
    {
        return false;
    }
    *out = static_cast<float>(v);
    return true;
}

inline bool shim_read_scalar(const std::string &s, bool *out)
{
    if (s == "0")
    {
        *out = false;
        return true;
    }
    if (s == "1")
    {
        *out = true;
        return true;
    }
    std::string lower(s);
    for (char &ch : lower)
    {
        ch = static_cast<char>(::tolower(static_cast<unsigned char>(ch)));
    }
    if (lower == "true")
    {
        *out = true;
        return true;
    }
    if (lower == "false")
    {
        *out = false;
        return true;
    }
    return false;
}

inline bool shim_read_scalar(const std::string &s, std::string *out)
{
    *out = s;
    return true;
}

// ---------------------------------------------------------------------------
// Tree
// ---------------------------------------------------------------------------

class Tree
{
public:
    std::vector<NodeData> m_nodes;

    Tree() { m_nodes.emplace_back(); } // node 0 is the root

    size_t root_id() const { return 0; }
    NodeData &node(size_t id) { return m_nodes[id]; }
    const NodeData &node(size_t id) const { return m_nodes[id]; }

    size_t append_child_of(size_t parent)
    {
        m_nodes.emplace_back();
        const size_t id = m_nodes.size() - 1;
        m_nodes[id].parent = parent;
        m_nodes[parent].children.push_back(id);
        return id;
    }

    size_t find_child_of(size_t parent, const c4::csubstr &key) const
    {
        for (const size_t child : m_nodes[parent].children)
        {
            const NodeData &n = m_nodes[child];
            if (n.has_key && c4::to_csubstr(n.key) == key)
            {
                return child;
            }
        }
        return NPOS;
    }

    void remove_child_of(size_t parent, const c4::csubstr &key)
    {
        const size_t child = find_child_of(parent, key);
        if (child == NPOS)
        {
            return;
        }
        auto &kids = m_nodes[parent].children;
        for (auto it = kids.begin(); it != kids.end(); ++it)
        {
            if (*it == child)
            {
                kids.erase(it);
                break;
            }
        }
    }

    inline NodeRef rootref();
    inline ConstNodeRef rootref() const;
    inline ConstNodeRef crootref() const;
    inline ConstNodeRef operator[](const char *name) const;
    inline operator ConstNodeRef() const;
};

// ---------------------------------------------------------------------------
// ConstNodeRef
// ---------------------------------------------------------------------------

template <class T>
struct KeyExtractor
{
    T *dest;
};

template <class T>
inline KeyExtractor<T> key(T &dest)
{
    return KeyExtractor<T>{&dest};
}

struct ConstNodeRef
{
    const Tree *m_tree{nullptr};
    size_t m_id{NPOS};

    ConstNodeRef() = default;
    ConstNodeRef(const Tree *tree, size_t id) : m_tree(tree), m_id(id) {}

    bool invalid() const { return m_tree == nullptr || m_id == NPOS; }
    bool readable() const { return !invalid(); }

    const NodeData &data() const { return m_tree->node(m_id); }

    bool is_map() const { return !invalid() && (data().flags & MAP) != 0; }
    bool is_seq() const { return !invalid() && (data().flags & SEQ) != 0; }
    bool is_keyval() const
    {
        return !invalid() && data().has_key && data().has_val;
    }
    bool has_val() const { return !invalid() && data().has_val; }
    bool has_key() const { return !invalid() && data().has_key; }
    bool has_children() const
    {
        return !invalid() && !data().children.empty();
    }
    size_t num_children() const
    {
        return invalid() ? 0 : data().children.size();
    }
    bool has_child(const c4::csubstr &name) const
    {
        return !invalid() && m_tree->find_child_of(m_id, name) != NPOS;
    }

    c4::csubstr key() const { return c4::to_csubstr(data().key); }
    c4::csubstr val() const { return c4::to_csubstr(data().val); }

    ConstNodeRef find_child(const c4::csubstr &name) const
    {
        if (invalid())
        {
            return {};
        }
        const size_t child = m_tree->find_child_of(m_id, name);
        if (child == NPOS)
        {
            return {};
        }
        return {m_tree, child};
    }

    ConstNodeRef operator[](const c4::csubstr &name) const
    {
        return find_child(name);
    }
    ConstNodeRef operator[](const char *name) const
    {
        return find_child(c4::csubstr(name));
    }
    ConstNodeRef operator[](size_t pos) const
    {
        if (invalid() || pos >= data().children.size())
        {
            return {};
        }
        return {m_tree, data().children[pos]};
    }

    ConstNodeRef child(size_t pos) const { return (*this)[pos]; }
    ConstNodeRef first_child() const { return (*this)[size_t(0)]; }

    Location location(const Parser & /*parser*/) const
    {
        if (invalid())
        {
            return {};
        }
        return {0, data().line, data().col};
    }

    struct iterator
    {
        const Tree *tree;
        size_t parent;
        size_t pos;
        bool operator!=(const iterator &o) const { return pos != o.pos; }
        bool operator==(const iterator &o) const { return pos == o.pos; }
        iterator &operator++()
        {
            ++pos;
            return *this;
        }
        ConstNodeRef operator*() const
        {
            return {tree, tree->node(parent).children[pos]};
        }
    };

    iterator begin() const { return {m_tree, m_id, 0}; }
    iterator end() const
    {
        return {m_tree, m_id, invalid() ? 0 : data().children.size()};
    }

    template <class T>
    const ConstNodeRef &operator>>(T &dest) const
    {
        if (invalid() || !data().has_val ||
                !shim_read_scalar(data().val, &dest))
        {
            throw std::runtime_error(
                    "ryml shim: failed to deserialize node value");
        }
        return *this;
    }

    template <class T>
    const ConstNodeRef &operator>>(KeyExtractor<T> extractor) const
    {
        if (invalid() || !data().has_key ||
                !shim_read_scalar(data().key, extractor.dest))
        {
            throw std::runtime_error(
                    "ryml shim: failed to deserialize node key");
        }
        return *this;
    }
};

template <class T>
inline bool read(const ConstNodeRef &node, T *out)
{
    if (node.invalid() || !node.data().has_val)
    {
        return false;
    }
    return shim_read_scalar(node.data().val, out);
}

// ---------------------------------------------------------------------------
// NodeRef (writable)
// ---------------------------------------------------------------------------

template <class T>
inline std::string shim_write_scalar(const T &value)
{
    std::ostringstream ss;
    ss << value;
    return ss.str();
}

inline std::string shim_write_scalar(const bool &value)
{
    return value ? "true" : "false";
}

inline std::string shim_write_scalar(const double &value)
{
    std::ostringstream ss;
    ss.precision(17);
    ss << value;
    return ss.str();
}

inline std::string shim_write_scalar(const std::string &value)
{
    return value;
}

struct NodeRef
{
    Tree *m_tree{nullptr};
    size_t m_id{NPOS};

    NodeRef() = default;
    NodeRef(Tree *tree, size_t id) : m_tree(tree), m_id(id) {}

    bool invalid() const { return m_tree == nullptr || m_id == NPOS; }
    NodeData &data() { return m_tree->node(m_id); }
    const NodeData &data() const
    {
        return const_cast<const Tree *>(m_tree)->node(m_id);
    }

    operator ConstNodeRef() const { return {m_tree, m_id}; }

    bool has_child(const c4::csubstr &name) const
    {
        return !invalid() && m_tree->find_child_of(m_id, name) != NPOS;
    }
    void remove_child(const c4::csubstr &name)
    {
        m_tree->remove_child_of(m_id, name);
    }

    NodeRef &operator|=(type_bits flags)
    {
        data().flags |= flags;
        return *this;
    }

    NodeRef operator[](const c4::csubstr &name)
    {
        // find-or-create keyed child (ryml write semantics)
        size_t child = m_tree->find_child_of(m_id, name);
        if (child == NPOS)
        {
            child = m_tree->append_child_of(m_id);
            m_tree->node(child).has_key = true;
            m_tree->node(child).key.assign(name.str, name.len);
            m_tree->node(m_id).flags |= MAP;
        }
        return {m_tree, child};
    }
    NodeRef operator[](const char *name)
    {
        return (*this)[c4::csubstr(name)];
    }

    NodeRef append_child()
    {
        const size_t child = m_tree->append_child_of(m_id);
        return {m_tree, child};
    }

    template <class T>
    NodeRef &operator<<(const T &value)
    {
        data().has_val = true;
        data().val = shim_write_scalar(value);
        data().flags |= VAL;
        return *this;
    }
};

inline NodeRef Tree::rootref() { return {this, 0}; }
inline ConstNodeRef Tree::rootref() const { return {this, 0}; }
inline ConstNodeRef Tree::crootref() const { return {this, 0}; }
inline ConstNodeRef Tree::operator[](const char *name) const
{
    return crootref().find_child(c4::csubstr(name));
}
inline Tree::operator ConstNodeRef() const { return crootref(); }

// ---------------------------------------------------------------------------
// Parser
// ---------------------------------------------------------------------------

struct ParserOptions
{
    bool m_locations{false};
    ParserOptions &locations(bool enable)
    {
        m_locations = enable;
        return *this;
    }
};

struct EventHandlerTree
{
};

class Parser
{
public:
    Parser() = default;
    explicit Parser(EventHandlerTree * /*handler*/,
            ParserOptions options = {})
            : m_options(options)
    {
    }
    ParserOptions m_options{};
};

// ---------------------------------------------------------------------------
// The YAML-subset parser
// ---------------------------------------------------------------------------

namespace detail {

struct ParseError : std::runtime_error
{
    explicit ParseError(const std::string &msg) : std::runtime_error(msg) {}
};

struct Cursor
{
    const char *buf;
    size_t len;
    size_t pos{0};
    size_t line{0};
    size_t col{0};

    bool eof() const { return pos >= len; }
    char peek() const { return buf[pos]; }
    char get()
    {
        const char ch = buf[pos++];
        if (ch == '\n')
        {
            ++line;
            col = 0;
        }
        else
        {
            ++col;
        }
        return ch;
    }
};

inline void skip_flow_ws(Cursor &cur)
{
    while (!cur.eof())
    {
        const char ch = cur.peek();
        if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r')
        {
            cur.get();
        }
        else if (ch == '#')
        {
            while (!cur.eof() && cur.peek() != '\n')
            {
                cur.get();
            }
        }
        else
        {
            break;
        }
    }
}

inline std::string parse_quoted(Cursor &cur)
{
    const char quote = cur.get(); // consume opening quote
    std::string out;
    while (!cur.eof())
    {
        const char ch = cur.get();
        if (quote == '\'' && ch == '\'')
        {
            if (!cur.eof() && cur.peek() == '\'')
            {
                out.push_back('\'');
                cur.get();
                continue;
            }
            return out;
        }
        if (quote == '"' && ch == '"')
        {
            return out;
        }
        if (quote == '"' && ch == '\\' && !cur.eof())
        {
            const char esc = cur.get();
            switch (esc)
            {
            case 'n': out.push_back('\n'); break;
            case 't': out.push_back('\t'); break;
            case '\\': out.push_back('\\'); break;
            case '"': out.push_back('"'); break;
            default: out.push_back(esc); break;
            }
            continue;
        }
        out.push_back(ch);
    }
    throw ParseError("unterminated quoted scalar");
}

// Plain flow scalar: ends at one of the stop characters (unquoted)
inline std::string parse_flow_plain(Cursor &cur)
{
    std::string out;
    while (!cur.eof())
    {
        const char ch = cur.peek();
        if (ch == ',' || ch == '}' || ch == ']' || ch == '\n' || ch == '#')
        {
            break;
        }
        if (ch == ':' && cur.pos + 1 < cur.len &&
                (cur.buf[cur.pos + 1] == ' ' || cur.buf[cur.pos + 1] == '\n' ||
                        cur.buf[cur.pos + 1] == ',' ||
                        cur.buf[cur.pos + 1] == '}' ||
                        cur.buf[cur.pos + 1] == '{' ||
                        cur.buf[cur.pos + 1] == '['))
        {
            break;
        }
        // bare ':' at end of buffer also terminates
        if (ch == ':' && cur.pos + 1 >= cur.len)
        {
            break;
        }
        out.push_back(ch);
        cur.get();
    }
    // trim trailing spaces
    while (!out.empty() && (out.back() == ' ' || out.back() == '\t'))
    {
        out.pop_back();
    }
    return out;
}

inline void parse_flow_node(Tree &tree, size_t node_id, Cursor &cur);

inline void parse_flow_map(Tree &tree, size_t node_id, Cursor &cur)
{
    tree.node(node_id).flags |= MAP | FLOW_SL;
    cur.get(); // consume '{'
    skip_flow_ws(cur);
    if (!cur.eof() && cur.peek() == '}')
    {
        cur.get();
        return;
    }
    while (!cur.eof())
    {
        skip_flow_ws(cur);
        const size_t child = tree.append_child_of(node_id);
        tree.node(child).line = cur.line;
        tree.node(child).col = cur.col;
        // key
        std::string key_str;
        if (cur.peek() == '\'' || cur.peek() == '"')
        {
            key_str = parse_quoted(cur);
        }
        else
        {
            key_str = parse_flow_plain(cur);
        }
        tree.node(child).has_key = true;
        tree.node(child).key = key_str;
        tree.node(child).flags |= KEY;
        skip_flow_ws(cur);
        if (cur.eof() || cur.peek() != ':')
        {
            throw ParseError("expected ':' in flow mapping");
        }
        cur.get(); // ':'
        skip_flow_ws(cur);
        parse_flow_node(tree, child, cur);
        skip_flow_ws(cur);
        if (cur.eof())
        {
            throw ParseError("unterminated flow mapping");
        }
        if (cur.peek() == ',')
        {
            cur.get();
            skip_flow_ws(cur);
            if (!cur.eof() && cur.peek() == '}')
            {
                cur.get();
                return;
            }
            continue;
        }
        if (cur.peek() == '}')
        {
            cur.get();
            return;
        }
        throw ParseError("expected ',' or '}' in flow mapping");
    }
    throw ParseError("unterminated flow mapping");
}

inline void parse_flow_seq(Tree &tree, size_t node_id, Cursor &cur)
{
    tree.node(node_id).flags |= SEQ | FLOW_SL;
    cur.get(); // consume '['
    skip_flow_ws(cur);
    if (!cur.eof() && cur.peek() == ']')
    {
        cur.get();
        return;
    }
    while (!cur.eof())
    {
        skip_flow_ws(cur);
        const size_t child = tree.append_child_of(node_id);
        tree.node(child).line = cur.line;
        tree.node(child).col = cur.col;
        if (cur.peek() == '{' || cur.peek() == '[')
        {
            parse_flow_node(tree, child, cur);
        }
        else
        {
            // Scalar item — or a "key: value" single-pair mapping
            // (YAML allows bare pairs inside flow sequences)
            std::string scalar;
            if (cur.peek() == '\'' || cur.peek() == '"')
            {
                scalar = parse_quoted(cur);
            }
            else
            {
                scalar = parse_flow_plain(cur);
            }
            while (!cur.eof() &&
                    (cur.peek() == ' ' || cur.peek() == '\t'))
            {
                cur.get();
            }
            if (!cur.eof() && cur.peek() == ':')
            {
                cur.get(); // ':'
                skip_flow_ws(cur);
                tree.node(child).flags |= MAP | FLOW_SL;
                const size_t pair = tree.append_child_of(child);
                tree.node(pair).has_key = true;
                tree.node(pair).key = scalar;
                tree.node(pair).flags |= KEY;
                tree.node(pair).line = cur.line;
                tree.node(pair).col = cur.col;
                parse_flow_node(tree, pair, cur);
            }
            else
            {
                tree.node(child).has_val = true;
                tree.node(child).val = scalar;
                tree.node(child).flags |= VAL;
            }
        }
        skip_flow_ws(cur);
        if (cur.eof())
        {
            throw ParseError("unterminated flow sequence");
        }
        if (cur.peek() == ',')
        {
            cur.get();
            skip_flow_ws(cur);
            if (!cur.eof() && cur.peek() == ']')
            {
                cur.get();
                return;
            }
            continue;
        }
        if (cur.peek() == ']')
        {
            cur.get();
            return;
        }
        throw ParseError("expected ',' or ']' in flow sequence");
    }
    throw ParseError("unterminated flow sequence");
}

inline void parse_flow_node(Tree &tree, size_t node_id, Cursor &cur)
{
    if (cur.eof())
    {
        tree.node(node_id).has_val = true;
        tree.node(node_id).flags |= VAL;
        return;
    }
    const char ch = cur.peek();
    if (ch == '{')
    {
        parse_flow_map(tree, node_id, cur);
    }
    else if (ch == '[')
    {
        parse_flow_seq(tree, node_id, cur);
    }
    else if (ch == '\'' || ch == '"')
    {
        tree.node(node_id).has_val = true;
        tree.node(node_id).val = parse_quoted(cur);
        tree.node(node_id).flags |= VAL;
    }
    else
    {
        tree.node(node_id).has_val = true;
        tree.node(node_id).val = parse_flow_plain(cur);
        tree.node(node_id).flags |= VAL;
    }
}

struct Line
{
    size_t indent;
    std::string content; // comment-stripped, rtrimmed
    size_t line_no;
    bool seq_item; // starts with "- " (or bare "-")
};

inline std::vector<Line> split_lines(const char *buf, size_t len)
{
    std::vector<Line> lines;
    size_t pos = 0;
    size_t line_no = 0;
    while (pos < len)
    {
        size_t end = pos;
        while (end < len && buf[end] != '\n')
        {
            ++end;
        }
        std::string raw(buf + pos, end - pos);
        if (!raw.empty() && raw.back() == '\r')
        {
            raw.pop_back();
        }
        // strip comments (a '#' outside quotes, preceded by start or space)
        bool in_squote = false;
        bool in_dquote = false;
        size_t cut = std::string::npos;
        for (size_t i = 0; i < raw.size(); ++i)
        {
            const char ch = raw[i];
            if (in_squote)
            {
                if (ch == '\'')
                {
                    in_squote = false;
                }
            }
            else if (in_dquote)
            {
                if (ch == '\\')
                {
                    ++i;
                }
                else if (ch == '"')
                {
                    in_dquote = false;
                }
            }
            else if (ch == '\'')
            {
                in_squote = true;
            }
            else if (ch == '"')
            {
                in_dquote = true;
            }
            else if (ch == '#' && (i == 0 || raw[i - 1] == ' ' ||
                                          raw[i - 1] == '\t'))
            {
                cut = i;
                break;
            }
        }
        if (cut != std::string::npos)
        {
            raw.resize(cut);
        }
        while (!raw.empty() && (raw.back() == ' ' || raw.back() == '\t'))
        {
            raw.pop_back();
        }
        size_t indent = 0;
        while (indent < raw.size() && raw[indent] == ' ')
        {
            ++indent;
        }
        if (indent < raw.size() && raw.substr(indent) != "---")
        {
            const std::string content = raw.substr(indent);
            const bool seq_item = content == "-" ||
                    (content.size() >= 2 && content[0] == '-' &&
                            content[1] == ' ');
            lines.push_back({indent, content, line_no, seq_item});
        }
        pos = end + 1;
        ++line_no;
    }
    return lines;
}

// Find the position of the key/value separator ": " (or ':' at line end) in
// a block-mapping line, honouring quotes and bracket nesting in the key.
inline size_t find_block_colon(const std::string &s)
{
    bool in_squote = false;
    bool in_dquote = false;
    int depth = 0;
    for (size_t i = 0; i < s.size(); ++i)
    {
        const char ch = s[i];
        if (in_squote)
        {
            if (ch == '\'')
            {
                in_squote = false;
            }
        }
        else if (in_dquote)
        {
            if (ch == '\\')
            {
                ++i;
            }
            else if (ch == '"')
            {
                in_dquote = false;
            }
        }
        else if (ch == '\'')
        {
            in_squote = true;
        }
        else if (ch == '"')
        {
            in_dquote = true;
        }
        else if (ch == '[' || ch == '{')
        {
            ++depth;
        }
        else if (ch == ']' || ch == '}')
        {
            --depth;
        }
        else if (ch == ':' && depth == 0)
        {
            if (i + 1 >= s.size() || s[i + 1] == ' ')
            {
                return i;
            }
        }
    }
    return std::string::npos;
}

inline std::string unquote_key(const std::string &key)
{
    if (key.size() >= 2 &&
            ((key.front() == '\'' && key.back() == '\'') ||
                    (key.front() == '"' && key.back() == '"')))
    {
        // Also collapse doubled single quotes
        std::string inner = key.substr(1, key.size() - 2);
        if (key.front() == '\'')
        {
            std::string out;
            for (size_t i = 0; i < inner.size(); ++i)
            {
                out.push_back(inner[i]);
                if (inner[i] == '\'' && i + 1 < inner.size() &&
                        inner[i + 1] == '\'')
                {
                    ++i;
                }
            }
            return out;
        }
        return inner;
    }
    return key;
}

class BlockParser
{
public:
    BlockParser(Tree &tree, const char *buf, size_t len)
            : m_tree(tree), m_buf(buf), m_len(len),
              m_lines(split_lines(buf, len))
    {
    }

    void parse()
    {
        if (m_lines.empty())
        {
            return;
        }
        size_t idx = 0;
        // A document that opens with flow at the root
        const std::string &first = m_lines[0].content;
        if (first[0] == '{' || first[0] == '[')
        {
            Cursor cur{m_buf, m_len, 0, 0, 0};
            skip_flow_ws(cur);
            parse_flow_node(m_tree, 0, cur);
            return;
        }
        parse_block(0, m_lines[0].indent, idx);
    }

private:
    Tree &m_tree;
    const char *m_buf;
    size_t m_len;
    std::vector<Line> m_lines;

    // Parse a run of lines at exactly `indent` as children of node_id.
    // Stops at the first line with indent < `indent`.
    void parse_block(size_t node_id, size_t indent, size_t &idx)
    {
        const bool is_seq_block =
                idx < m_lines.size() && m_lines[idx].seq_item;
        m_tree.node(node_id).flags |= is_seq_block ? SEQ : MAP;
        while (idx < m_lines.size())
        {
            const Line &line = m_lines[idx];
            if (line.indent < indent)
            {
                return;
            }
            if (line.indent > indent)
            {
                throw ParseError("unexpected indentation at line " +
                        std::to_string(line.line_no + 1));
            }
            if (line.seq_item != is_seq_block)
            {
                // e.g. a mapping continued after seq items at same indent:
                // let the caller handle it
                return;
            }
            if (is_seq_block)
            {
                parse_seq_item(node_id, line, idx);
            }
            else
            {
                parse_map_entry(node_id, line, idx);
            }
        }
    }

    void parse_seq_item(size_t parent, const Line &line, size_t &idx)
    {
        const size_t child = m_tree.append_child_of(parent);
        m_tree.node(child).line = line.line_no;
        m_tree.node(child).col = line.indent;
        const std::string rest =
                line.content == "-" ? "" : line.content.substr(2);
        const size_t rest_indent = line.indent + 2;
        ++idx;
        if (rest.empty())
        {
            // nested block on following lines
            if (idx < m_lines.size() && m_lines[idx].indent > line.indent)
            {
                parse_block(child, m_lines[idx].indent, idx);
            }
            else
            {
                m_tree.node(child).has_val = true;
                m_tree.node(child).flags |= VAL;
            }
            return;
        }
        if (rest[0] == '{' || rest[0] == '[')
        {
            parse_flow_from(child, line, rest_indent);
            // skip any continuation lines the flow consumed
            skip_consumed_lines(idx, line.line_no, rest_indent, rest);
            return;
        }
        const size_t colon = find_block_colon(rest);
        if (colon == std::string::npos)
        {
            // plain scalar item
            m_tree.node(child).has_val = true;
            m_tree.node(child).val = unquote_key(rest);
            m_tree.node(child).flags |= VAL;
            return;
        }
        // "- key: ..." compact mapping: the item is a map whose first entry
        // comes from this line; following lines at rest_indent continue it
        m_tree.node(child).flags |= MAP;
        parse_map_entry_text(child, rest, line.line_no, rest_indent, idx);
        while (idx < m_lines.size() && m_lines[idx].indent == rest_indent &&
                !m_lines[idx].seq_item)
        {
            parse_map_entry(child, m_lines[idx], idx);
        }
    }

    void parse_map_entry(size_t parent, const Line &line, size_t &idx)
    {
        ++idx;
        parse_map_entry_text(
                parent, line.content, line.line_no, line.indent, idx);
    }

    // Shared body for a "key: value" entry whose children may follow at a
    // deeper indent. `entry_indent` is the column of the key.
    void parse_map_entry_text(size_t parent, const std::string &text,
            size_t line_no, size_t entry_indent, size_t &idx)
    {
        const size_t colon = find_block_colon(text);
        if (colon == std::string::npos)
        {
            throw ParseError("expected ':' in mapping at line " +
                    std::to_string(line_no + 1));
        }
        std::string key_str = text.substr(0, colon);
        while (!key_str.empty() && key_str.back() == ' ')
        {
            key_str.pop_back();
        }
        const size_t child = m_tree.append_child_of(parent);
        m_tree.node(child).has_key = true;
        m_tree.node(child).key = unquote_key(key_str);
        m_tree.node(child).flags |= KEY;
        m_tree.node(child).line = line_no;
        m_tree.node(child).col = entry_indent;
        std::string value = colon + 1 < text.size() ? text.substr(colon + 1)
                                                    : std::string();
        while (!value.empty() && value.front() == ' ')
        {
            value.erase(value.begin());
        }
        if (value.empty())
        {
            // nested block (map or seq) or null
            if (idx < m_lines.size() &&
                    (m_lines[idx].indent > entry_indent ||
                            (m_lines[idx].indent == entry_indent &&
                                    m_lines[idx].seq_item)))
            {
                parse_block(child, m_lines[idx].indent, idx);
            }
            else
            {
                m_tree.node(child).has_val = true;
                m_tree.node(child).flags |= VAL;
            }
            return;
        }
        if (value[0] == '{' || value[0] == '[')
        {
            parse_flow_from_value(child, line_no, text, entry_indent);
            skip_consumed_lines(idx, line_no, entry_indent + 1, value);
            return;
        }
        if (value[0] == '\'' || value[0] == '"')
        {
            m_tree.node(child).has_val = true;
            m_tree.node(child).val = unquote_key(value);
            m_tree.node(child).flags |= VAL;
            return;
        }
        m_tree.node(child).has_val = true;
        m_tree.node(child).val = value;
        m_tree.node(child).flags |= VAL;
    }

    // Parse a flow collection that starts mid-line and may span lines.
    // Locates the absolute buffer offset of this line, then runs the flow
    // parser from the collection opener.
    size_t line_offset(size_t line_no) const
    {
        size_t pos = 0;
        size_t line = 0;
        while (pos < m_len && line < line_no)
        {
            if (m_buf[pos] == '\n')
            {
                ++line;
            }
            ++pos;
        }
        return pos;
    }

    void parse_flow_from(size_t node_id, const Line &line, size_t)
    {
        const size_t offset = line_offset(line.line_no);
        Cursor cur{m_buf, m_len, offset, line.line_no, 0};
        // advance to the opener
        while (!cur.eof() && cur.peek() != '{' && cur.peek() != '[')
        {
            cur.get();
        }
        parse_flow_node(m_tree, node_id, cur);
        m_flow_end_line = cur.line;
    }

    void parse_flow_from_value(size_t node_id, size_t line_no,
            const std::string &text, size_t /*entry_indent*/)
    {
        const size_t offset = line_offset(line_no);
        Cursor cur{m_buf, m_len, offset, line_no, 0};
        // advance to the colon position, then the opener
        const size_t colon = find_block_colon(text);
        // text is the comment-stripped content; scan the raw buffer for the
        // same colon occurrence by skipping indent + colon offset
        size_t to_skip = 0;
        while (!cur.eof() && (cur.buf[cur.pos] == ' '))
        {
            cur.get();
        }
        to_skip = colon + 1;
        for (size_t i = 0; i < to_skip && !cur.eof(); ++i)
        {
            cur.get();
        }
        while (!cur.eof() && cur.peek() != '{' && cur.peek() != '[')
        {
            cur.get();
        }
        parse_flow_node(m_tree, node_id, cur);
        m_flow_end_line = cur.line;
    }

    // After an inline flow spanned multiple physical lines, drop the block
    // lines it consumed.
    void skip_consumed_lines(size_t &idx, size_t start_line, size_t,
            const std::string &)
    {
        while (idx < m_lines.size() &&
                m_lines[idx].line_no <= m_flow_end_line &&
                m_lines[idx].line_no > start_line)
        {
            ++idx;
        }
    }

    size_t m_flow_end_line{0};
};

} // namespace detail

inline Tree parse_in_place(Parser * /*parser*/, char *buf)
{
    Tree tree;
    detail::BlockParser parser(tree, buf, ::strlen(buf));
    parser.parse();
    return tree;
}

inline Tree parse_in_place(char *buf)
{
    Tree tree;
    detail::BlockParser parser(tree, buf, ::strlen(buf));
    parser.parse();
    return tree;
}

inline Tree parse_in_arena(const char *buf)
{
    Tree tree;
    detail::BlockParser parser(tree, buf, ::strlen(buf));
    parser.parse();
    return tree;
}

inline Tree parse_in_arena(const c4::csubstr &buf)
{
    Tree tree;
    detail::BlockParser parser(tree, buf.str, buf.len);
    parser.parse();
    return tree;
}

// ---------------------------------------------------------------------------
// Emission
// ---------------------------------------------------------------------------

namespace detail {

inline bool key_needs_quotes(const std::string &s)
{
    if (s.empty())
    {
        return true;
    }
    for (const char ch : s)
    {
        if (ch == ':' || ch == '#' || ch == '{' || ch == '}' || ch == '[' ||
                ch == ']' || ch == ',' || ch == '\'' || ch == '"' ||
                ch == '\n')
        {
            return true;
        }
    }
    return s.front() == ' ' || s.back() == ' ';
}

inline std::string emit_scalar(const std::string &s)
{
    if (key_needs_quotes(s))
    {
        std::string out = "'";
        for (const char ch : s)
        {
            out.push_back(ch);
            if (ch == '\'')
            {
                out.push_back('\'');
            }
        }
        out.push_back('\'');
        return out;
    }
    return s;
}

inline void emit_flow(std::ostream &os, const Tree &tree, size_t id);

inline void emit_flow_children(
        std::ostream &os, const Tree &tree, size_t id, bool map)
{
    bool first = true;
    for (const size_t child : tree.node(id).children)
    {
        if (!first)
        {
            os << ", ";
        }
        first = false;
        if (map)
        {
            os << emit_scalar(tree.node(child).key) << ": ";
        }
        emit_flow(os, tree, child);
    }
}

inline void emit_flow(std::ostream &os, const Tree &tree, size_t id)
{
    const NodeData &n = tree.node(id);
    if ((n.flags & MAP) != 0)
    {
        os << '{';
        emit_flow_children(os, tree, id, true);
        os << '}';
    }
    else if ((n.flags & SEQ) != 0)
    {
        os << '[';
        emit_flow_children(os, tree, id, false);
        os << ']';
    }
    else
    {
        os << emit_scalar(n.val);
    }
}

inline void emit_block(
        std::ostream &os, const Tree &tree, size_t id, size_t indent)
{
    const NodeData &n = tree.node(id);
    const std::string pad(indent, ' ');
    for (const size_t child_id : n.children)
    {
        const NodeData &child = tree.node(child_id);
        const bool seq = (n.flags & SEQ) != 0;
        os << pad;
        if (seq)
        {
            os << "- ";
        }
        if (child.has_key)
        {
            os << emit_scalar(child.key) << ":";
        }
        if ((child.flags & (MAP | SEQ)) != 0)
        {
            if ((child.flags & FLOW_SL) != 0)
            {
                if (child.has_key)
                {
                    os << ' ';
                }
                emit_flow(os, tree, child_id);
                os << '\n';
            }
            else if (child.children.empty())
            {
                os << ((child.flags & MAP) != 0 ? " {}" : " []") << '\n';
            }
            else
            {
                os << '\n';
                emit_block(os, tree, child_id,
                        indent + (seq ? 2 : 2));
            }
        }
        else
        {
            if (child.has_key)
            {
                os << ' ';
            }
            os << emit_scalar(child.val) << '\n';
        }
    }
}

} // namespace detail

inline std::ostream &operator<<(std::ostream &os, const Tree &tree)
{
    const NodeData &root = tree.node(0);
    if ((root.flags & FLOW_SL) != 0)
    {
        detail::emit_flow(os, tree, 0);
        os << '\n';
    }
    else
    {
        detail::emit_block(os, tree, 0, 0);
    }
    return os;
}

} // namespace c4::yml

namespace ryml {
using namespace c4::yml;
} // namespace ryml

#endif // RYML_SHIM_HPP_
