package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.WebApi

/** Reference glob semantics, verbatim from mods/util/glob/glob_test.go
  * (TestMatch + the minio-derived TestWildcardMatch table): '*' and '?'
  * cross '/' (unlike Go's path.Match), classes support ranges and '^'
  * negation. Run against the regex translation behind the tables-door
  * name filter. */
class GlobMatchSpec extends AnyFunSuite {
  private def m(pattern: String, s: String): Boolean =
    WebApi.globToRegex(pattern).matches(s)

  test("TestMatch cases (glob_test.go:53-96)") {
    assert(m("hello world", "hello world"))
    assert(!m("jello world", "hello world"))
    assert(m("hello*", "hello world"))
    assert(!m("jello*", "hello world"))
    assert(m("hello?world", "hello world"))
    assert(!m("jello?world", "hello world"))
    assert(m("he*o?world", "hello world"))
    assert(m("he*o?wor*", "hello world"))
    assert(m("he*o?*r*", "hello world"))
    assert(m("*", "的情况下解析一个"))
    assert(m("*况下*", "的情况下解析一个"))
    assert(m("*况?*", "的情况下解析一个"))
    assert(m("的情况?解析一个", "的情况下解析一个"))
    assert(m("$SYS/*", "$SYS/plugs/UNK1_1234567890ABCDE"))
  }

  test("TestWildcardMatch '*' cases (glob_test.go:101-200)") {
    assert(m("my-folder/oo*", "my-folder/oo"))
    assert(m("my-folder/In*", "my-folder/India/Karnataka/"))
    assert(!m("my-folder/In*", "my-folder/Karnataka/India/"))
    assert(m("my-folder/In*/Ka*/Ban", "my-folder/India/Karnataka/Ban"))
    assert(m("my-folder/In*/Ka*/Ban", "my-folder/India/Karnataka/Ban/Ban/Ban/Ban/Ban"))
    assert(m("my-folder/In*/Ka*/Ban", "my-folder/India/Karnataka/Area1/Area2/Area3/Ban"))
    assert(m("my-folder/In*/Ka*/Ban", "my-folder/India/State1/State2/Karnataka/Area1/Area2/Area3/Ban"))
    assert(!m("my-folder/In*/Ka*/Ban", "my-folder/India/Karnataka/Bangalore"))
    assert(m("my-folder/In*/Ka*/Ban*", "my-folder/India/Karnataka/Bangalore"))
    assert(m("my-folder/*", "my-folder/India"))
    assert(!m("my-folder/oo*", "my-folder/odo"))
  }

  test("TestWildcardMatch '?' cases (glob_test.go:200-340)") {
    assert(!m("my-folder?/abc*", "myfolder/abc"))
    assert(m("my-folder?/abc*", "my-folder1/abc"))
    assert(!m("my-?-folder/abc*", "my--folder/abc"))
    assert(m("my-?-folder/abc*", "my-1-folder/abc"))
    assert(m("my-?-folder/abc*", "my-k-folder/abc"))
    assert(!m("my??folder/abc*", "myfolder/abc"))
    assert(m("my??folder/abc*", "my4afolder/abc"))
    assert(m("my-folder?abc*", "my-folder/abc"))
    assert(m("my-folder/abc?efg", "my-folder/abcdefg"))
    assert(m("my-folder/abc?efg", "my-folder/abc/efg"))
    assert(!m("my-folder/abc????", "my-folder/abc"))
    assert(!m("my-folder/abc????", "my-folder/abcde"))
    assert(m("my-folder/abc????", "my-folder/abcdefg"))
    assert(!m("my-folder/abc?", "my-folder/abc"))
    assert(m("my-folder/abc?", "my-folder/abcd"))
    assert(!m("my-folder/abc?", "my-folder/abcde"))
    assert(!m("my-folder/mnop*?", "my-folder/mnop"))
    assert(m("my-folder/mnop*?", "my-folder/mnopqrst/mnopqr"))
    assert(m("my-folder/mnop*?", "my-folder/mnopqrst/mnopqrs"))
    assert(m("my-folder/mnop*?", "my-folder/mnopq"))
    assert(m("my-folder/mnop*?", "my-folder/mnopqr"))
    assert(m("my-folder/mnop*?and", "my-folder/mnopqand"))
    assert(!m("my-folder/mnop*?and", "my-folder/mnopand"))
    assert(!m("my-folder/mnop*?", "my-folder/mn"))
    assert(m("my-folder/mnop*??", "my-folder/mnopqrst"))
    assert(m("my-folder/mnop*qrst", "my-folder/mnopabcdegqrst"))
    assert(m("my-folder/mnop*?and?", "my-folder/mnopqanda"))
    assert(!m("my-folder/mnop*?and", "my-folder/mnopqanda"))
    assert(!m("my-?-folder/abc*", "my-folder/mnopqanda"))
  }

  test("character classes, escapes, and malformed patterns") {
    // '[...]' with ranges and '^' negation (match.go:19-27)
    assert(m("[ab]cd", "acd") && m("[ab]cd", "bcd") && !m("[ab]cd", "ccd"))
    assert(m("x[a-c]z", "xbz") && !m("x[a-c]z", "xdz"))
    assert(m("x[^a-c]z", "xdz") && !m("x[^a-c]z", "xbz"))
    // escaped metacharacters are literals
    assert(m("a\\*b", "a*b") && !m("a\\*b", "axb"))
    assert(m("a\\?b", "a?b") && !m("a\\?b", "axb"))
    // a '[' with no closing ']' degrades to a literal (reference:
    // ErrBadPattern → zero rows; the literal likewise never matches a
    // real table name)
    assert(m("a[bc", "a[bc") && !m("a[bc", "ab"))
    // the door's case-insensitive contract (names are uppercased)
    assert(m("ex?mple", "EXAMPLE".toLowerCase) && m("EX?MPLE", "example"))
  }
}
